from fr_tpu.data.augment import augment_batch, augment_cfg_from_conf, normalize_only  # noqa: F401
from fr_tpu.data.device_corpus import DeviceCorpusLoader  # noqa: F401
from fr_tpu.data.folder import ArrayTrainLoader, ImageFolderIndex, TrainLoader  # noqa: F401
from fr_tpu.data.packed import PackedTrainLoader, pack_image_folder  # noqa: F401
from fr_tpu.data.pairs import CrossDataset, PairDataset  # noqa: F401
from fr_tpu.data.synthetic import (  # noqa: F401
    ArrayPairDataset,
    synthetic_corpus,
    synthetic_pairs,
    write_synthetic_folder,
)
