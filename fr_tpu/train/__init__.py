from fr_tpu.train.schedule import cosine_annealing_warmup_restarts, get_schedule  # noqa: F401
from fr_tpu.train.state import TrainState, init_train_state, state_partition_specs  # noqa: F401
from fr_tpu.train.step import make_embed_step, make_train_step, shard_batch  # noqa: F401
