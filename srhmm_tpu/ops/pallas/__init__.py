from .emission_pallas import emission_log_b_pallas, log_state_emission_fused
from .forward_pallas import (
    backtrace,
    log_forward_batch_pallas,
    viterbi_batch_pallas,
)

__all__ = [
    "emission_log_b_pallas",
    "log_state_emission_fused",
    "backtrace",
    "log_forward_batch_pallas",
    "viterbi_batch_pallas",
]
