"""WER / accuracy metrics."""

from srhmm_tpu.eval.metrics import WerCounts, edit_alignment, isolated_accuracy


def test_exact_match():
    c = edit_alignment(["a", "b", "c"], ["a", "b", "c"])
    assert c.errors == 0 and c.wer == 0.0


def test_substitution_insertion_deletion():
    c = edit_alignment(["a", "b", "c"], ["a", "x", "c"])
    assert (c.substitutions, c.insertions, c.deletions) == (1, 0, 0)
    c = edit_alignment(["a", "b"], ["a", "b", "c"])
    assert (c.substitutions, c.insertions, c.deletions) == (0, 1, 0)
    c = edit_alignment(["a", "b", "c"], ["a", "c"])
    assert (c.substitutions, c.insertions, c.deletions) == (0, 0, 1)


def test_wer_aggregation():
    total = edit_alignment(["a", "b"], ["a", "x"]) + edit_alignment(
        ["c"], ["c"]
    )
    assert total.num_ref_words == 3
    assert total.errors == 1
    assert abs(total.wer - 1 / 3) < 1e-12


def test_empty_and_all_wrong():
    assert edit_alignment([], []).wer == 0.0
    c = edit_alignment(["a"], [])
    assert c.deletions == 1 and c.wer == 1.0
    assert isolated_accuracy(["a", "b"], ["a", "c"]) == 0.5
