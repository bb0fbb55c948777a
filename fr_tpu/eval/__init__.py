from fr_tpu.eval.verification import (  # noqa: F401
    NUM_BINS,
    cross_score,
    pair_score,
    pair_score_device,
    performance_acc,
    performance_roc,
)
