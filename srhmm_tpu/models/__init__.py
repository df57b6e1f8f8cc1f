from .decision_tree import (
    ClusterResult,
    Question,
    cluster_states,
    default_questions,
    questions_from_classes,
    state_stats_from_suffstats,
)
from .gmm_hmm import (
    DIAG,
    FULL,
    GmmHmm,
    GmmStream,
    concat_models,
    init_left_right_trans,
    pad_stack_models,
    stack_models,
    validate_model,
)

__all__ = [
    "DIAG",
    "FULL",
    "ClusterResult",
    "GmmHmm",
    "GmmStream",
    "Question",
    "concat_models",
    "cluster_states",
    "default_questions",
    "init_left_right_trans",
    "questions_from_classes",
    "pad_stack_models",
    "stack_models",
    "state_stats_from_suffstats",
    "validate_model",
]
