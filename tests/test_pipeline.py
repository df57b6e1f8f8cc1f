"""End-to-end pipeline integration: the framework as ONE system.

Locks the full chain — synthetic audio -> MFCC -> LBG flat start ->
monophone embedded EM -> decision-tree clustering -> tied fused EM ->
materialized lexicon -> bigram n-best decode -> WER — and every
inter-module seam it crosses (frontend->trainer dtype, tree->tied
hand-off, tied->decode materialization, decoder->WER).  Reference
anchor: the reference's own end-to-end program contract
(test/source/recognition-fs/recognition_continuous_fs.c:87-428).
"""

import numpy as np
import pytest

from srhmm_tpu.pipeline import (
    PipelineConfig,
    build_inventory,
    estimate_bigram,
    make_lexicon,
    run_pipeline,
    synthesize_dataset,
)

TINY = PipelineConfig(
    n_words=6,
    phones=("aa", "iy", "uw", "eh", "ow", "ae"),
    phones_per_word=2,
    min_words=2,
    max_words=3,
)


def test_lexicon_deterministic_and_covering():
    lex = make_lexicon(TINY)
    assert len(lex) == 6
    assert len({ph for _, ph in lex}) == 6  # distinct words
    used = {p for _, ph in lex for p in ph}
    assert used == set(range(6))  # every phone appears
    assert make_lexicon(TINY) == lex  # deterministic in seed


def test_synthesize_covers_all_words():
    waves, refs, _, _ = synthesize_dataset(TINY, n_train=12, n_test=2)
    assert {ids[0] for ids in refs[:6]} == set(range(6))
    assert all(w.dtype == np.float32 and w.ndim == 1 for w in waves)


def test_inventory_shared_units():
    lex = make_lexicon(TINY)
    units, word_unit_ids = build_inventory(TINY, lex)
    assert all(len(ids) == TINY.phones_per_word for ids in word_unit_ids)
    # triphone ids are consistent: same context triple -> same unit
    flat = [u for ids in word_unit_ids for u in ids]
    assert max(flat) == len(units) - 1


def test_bigram_lm_normalized():
    lm, init = estimate_bigram([[0, 1], [1, 2], [0, 2]], 3)
    np.testing.assert_allclose(np.exp(lm).sum(1), 1.0, rtol=1e-12)
    np.testing.assert_allclose(np.exp(init).sum(), 1.0, rtol=1e-12)


@pytest.fixture(scope="module")
def clean_result():
    return run_pipeline(
        TINY, n_train=24, n_test=8, max_iterations=4, tied_iterations=4
    )


def test_pipeline_end_to_end_clean(clean_result):
    res = clean_result
    # clean synthetic speech must decode near-perfectly
    assert res.wer.num_ref_words > 10
    assert res.wer.wer <= 0.10, (res.wer, res.hyps, res.refs)
    # the tree genuinely tied states (fewer senones than unit-states)
    assert res.n_senones < res.n_units * TINY.states_per_phone
    assert res.n_senones >= TINY.states_per_phone  # and didn't collapse
    # both EM stages ran and improved to a finite likelihood
    assert res.mono_iterations >= 1 and res.tied_iterations >= 1
    assert np.isfinite(res.mono_log_prob) and np.isfinite(res.tied_log_prob)
    # every stage was actually timed (the chain really chained)
    for stage in (
        "synthesize", "mfcc", "lbg_init", "monophone_em", "tree_cluster",
        "tied_em", "materialize", "decode", "wer",
    ):
        assert stage in res.stage_seconds


def test_pipeline_noisy_degrades_gracefully():
    import dataclasses

    noisy = dataclasses.replace(TINY, snr_db=0.0)
    res = run_pipeline(
        noisy, n_train=24, n_test=8, max_iterations=3, tied_iterations=3
    )
    # 0 dB SNR: still a working recognizer (synthetic formants are wideband
    # enough to survive), not a coin flip
    assert res.wer.wer <= 0.5, (res.wer, res.hyps, res.refs)


def test_pipeline_data_parallel_mesh(clean_result):
    """The same chain with both EM stages on the shard_map(lax.scan)
    multi-chip trainers — the seam between the pipeline and parallel/."""
    import jax

    from srhmm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices("cpu")[:4])
    res = run_pipeline(
        TINY, n_train=24, n_test=8, max_iterations=4, tied_iterations=4,
        mesh=mesh,
    )
    assert res.wer.wer <= 0.10, (res.wer, res.hyps, res.refs)
    assert res.hyps == clean_result.hyps


def test_pipeline_variable_word_lengths():
    """Round 5: a lexicon with 2- AND 3-phone words — the decode
    vocabulary stacks heterogeneous word HMMs (pad_stack_models) and
    decodes with per-word final states."""
    import dataclasses

    cfg = dataclasses.replace(TINY, phones_per_word=(2, 3))
    lex = __import__("srhmm_tpu.pipeline", fromlist=["make_lexicon"]).make_lexicon(cfg)
    assert len({len(ph) for _, ph in lex}) > 1  # genuinely heterogeneous
    res = run_pipeline(
        cfg, n_train=24, n_test=8, max_iterations=4, tied_iterations=4
    )
    assert res.wer.wer <= 0.10, (res.wer, res.hyps, res.refs)
