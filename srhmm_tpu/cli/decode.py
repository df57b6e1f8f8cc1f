"""Continuous recognition CLI: word-loop token-passing decode with N-best.

Usage:
    python -m srhmm_tpu.cli.decode model_list input_list output_file
        [--n-best K] [--exit-logprob X] [--ref ref_file]

model_list: list file of .hmm paths (the vocabulary); input_list: list file
of .perfil paths (one utterance each); output_file receives one line per
utterance:  <perfil>  <score>  <word sequence>, plus N-best blocks when
--n-best > 1.  --ref gives a transcript file (one line per utterance,
space-separated words) and adds a WER summary.

This is the capability the reference lacks entirely (isolated words only,
SURVEY §0); BASELINE.json config 3.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model_list")
    ap.add_argument("input_list")
    ap.add_argument("output_file")
    ap.add_argument("--n-best", type=int, default=1)
    ap.add_argument("--exit-logprob", type=float, default=None)
    ap.add_argument("--ref", default=None)
    ns = ap.parse_args(argv)

    from ..utils import ensure_usable_backend

    ensure_usable_backend()

    import jax.numpy as jnp
    import numpy as np

    from ..decode.continuous import decode_continuous
    from ..eval.metrics import WerCounts, edit_alignment
    from ..io import read_list, read_perfil, read_vocabulary
    from ..models import stack_models

    vocab = stack_models(read_vocabulary(ns.model_list)).astype(jnp.float32)
    words = list(vocab.word)
    kwargs = {}
    if ns.exit_logprob is not None:
        kwargs["exit_logprob"] = ns.exit_logprob

    refs = None
    if ns.ref:
        refs = [l.split() for l in open(ns.ref).read().splitlines() if l.strip()]

    total = WerCounts()
    with open(ns.output_file, "w") as out:
        for i, path in enumerate(read_list(ns.input_list)):
            frames = jnp.asarray(read_perfil(path), jnp.float32)
            hyps = decode_continuous(vocab, frames, n_best=ns.n_best, **kwargs)
            best_score, best_words, spans = hyps[0]
            hyp_words = [words[w] for w in best_words]
            out.write(f"{path}\t{best_score:.4f}\t{' '.join(hyp_words)}\n")
            for rank_i, (sc, ws, _) in enumerate(hyps[1:], start=2):
                out.write(
                    f"#  {rank_i}-best\t{sc:.4f}\t"
                    f"{' '.join(words[w] for w in ws)}\n"
                )
            if refs is not None and i < len(refs):
                total = total + edit_alignment(refs[i], hyp_words)
        if refs is not None:
            out.write(
                f"\nWER: {total.wer * 100.0:.2f}%  "
                f"(S={total.substitutions} I={total.insertions} "
                f"D={total.deletions} N={total.num_ref_words})\n"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
