"""Training CLI mirroring the reference argv contract.

Usage (hmm-full-fs/hmm_continuous_full_fs.c:166-176):

    python -m srhmm_tpu.cli.train word states_number param_number
        mix_number1 ... mix_numberN input_file1 ... input_fileN
        output_file [initial_model]

input_fileK is a list file naming one .perfil per training exemplar for
stream K.  Writes the binary model to output_file and the text summary to
the reference's derived name (first-dot truncation + ".txt").

Optional leading flags:
    --cov full|diag   covariance type (full = hmm_continuous_full_fs,
                      diag = hmm_continuous_fs); default full
    --threshold X     convergence threshold (default 1e-3, T1:36)
    --size-t-width N  .hmm size_t width (default 4, matching the fixtures)

The reference's warm-start bug (argv[argc] off-by-one, T1:204, which made the
documented initial_model argument unusable) is fixed, not replicated.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(add_help=True)
    ap.add_argument("--cov", choices=["full", "diag"], default="full")
    ap.add_argument("--threshold", type=float, default=1.0e-3)
    ap.add_argument("--size-t-width", type=int, default=4)
    ap.add_argument("rest", nargs=argparse.REMAINDER)
    ns = ap.parse_args(argv)
    rest = ns.rest
    if len(rest) < 5:
        print(
            "Usage: train word states_number param_number mix_number1 ... "
            "mix_numberN input_file1 ... input_fileN output_file [initial_model]",
            file=sys.stderr,
        )
        return 1

    import jax

    jax.config.update("jax_platforms", "cpu")  # f64 parity path

    from ..eval.report import (
        c_strftime_cpu,
        c_strftime_datetime,
        c_text_file_name,
        trainer_text_summary,
    )
    from ..init.lbg import create_initial_model
    from ..io import read_hmm, read_list, read_perfil, write_hmm
    from ..train.em_parity import train_word_parity

    start_wall = time.time()
    starting_time = c_strftime_datetime(start_wall)

    word = rest[0]
    states_number = int(rest[1])
    param_number = int(rest[2])
    mixture_numbers = [int(x) for x in rest[3 : 3 + param_number]]
    data_files = rest[3 + param_number : 3 + 2 * param_number]
    output_file = rest[3 + 2 * param_number]
    initial_model = (
        rest[3 + 2 * param_number + 1]
        if len(rest) > 3 + 2 * param_number + 1
        else None
    )

    utterances_per_stream = [
        [read_perfil(p) for p in read_list(df)] for df in data_files
    ]

    if initial_model:
        model = read_hmm(initial_model)
        model = model.replace(word=word)
    else:
        model = create_initial_model(
            utterances_per_stream,
            states_number,
            mixture_numbers,
            word=word,
            cov_type=ns.cov,
        )

    print("\nCreating HMM using Forward-Backward algorithm (Baum-Welch)")
    res = train_word_parity(
        utterances_per_stream, model, threshold=ns.threshold
    )
    print(f"\nFinal model after {res.iterations} iterations, "
          f"mean probability {res.mean_log_prob:f}")

    write_hmm(output_file, res.model, size_t_width=ns.size_t_width)

    text_file = c_text_file_name(output_file)
    cpu_seconds = time.process_time()
    with open(text_file, "w") as f:
        f.write(
            trainer_text_summary(
                model_file=output_file,
                word=word,
                states_number=states_number,
                param_number=param_number,
                mixture_numbers=mixture_numbers,
                data_files=data_files,
                threshold=ns.threshold,
                exemplar_number=res.exemplar_count,
                mean_probability=res.mean_log_prob,
                iterations=res.iterations,
                starting_time=starting_time,
                ending_time=c_strftime_datetime(),
                cpu_time=c_strftime_cpu(cpu_seconds),
                cov_type=ns.cov,
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
