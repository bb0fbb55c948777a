from fr_tpu.parallel.mesh import (  # noqa: F401
    BATCH_SPEC,
    CLASS_SPEC,
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    class_sharding,
    make_mesh,
    pad_classes,
    replicated,
)
