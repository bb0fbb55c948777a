from fr_tpu.ckpt.checkpoint import (  # noqa: F401
    export_encoder,
    latest_step,
    load_encoder,
    restore_train_state,
    save_train_state,
)
