from .gmm_hmm import (
    DIAG,
    FULL,
    GmmHmm,
    GmmStream,
    init_left_right_trans,
    stack_models,
    validate_model,
)

__all__ = [
    "DIAG",
    "FULL",
    "GmmHmm",
    "GmmStream",
    "init_left_right_trans",
    "stack_models",
    "validate_model",
]
