from .emission_pallas import emission_log_b_pallas, log_state_emission_fused
from .forward_pallas import (
    backtrace,
    log_forward_batch_pallas,
    viterbi_batch_pallas,
)
from .fused_em_pallas import (
    backward_stats_pallas,
    emit_forward_pallas,
    pack_lane_constants,
    trans_band,
)
from .scoring_pallas import score_batch_fused_lane, vocab_scores_pallas

__all__ = [
    "emission_log_b_pallas",
    "log_state_emission_fused",
    "backtrace",
    "log_forward_batch_pallas",
    "viterbi_batch_pallas",
    "backward_stats_pallas",
    "emit_forward_pallas",
    "pack_lane_constants",
    "trans_band",
    "score_batch_fused_lane",
    "vocab_scores_pallas",
]
