"""Configuration layer.

Replaces the reference's hardcoded ``HYPERPARAMS`` dict and argparse flags
(reference ``main.py:26-73``) with a real dataclass config while preserving
the CLI surface (``--debug``, ``--experiment_id``, ``--lr``) and the derived
scaling rules (batch size x device count at ``main.py:67``, lr = 0.0005 x
global batch at ``main.py:71``).
"""

from __future__ import annotations

import dataclasses
import datetime
import os
from typing import Optional, Sequence

NB_CLASSES = 1108  # reference main.py:86
NB_CHANNELS = 6
SRC_SIZE = 512     # source microscopy image side (compute_stats_experiments.py:21)
CROP_SIZE = 364    # reference dataloader.py:47,50


@dataclasses.dataclass
class DataConfig:
    """Paths + data-pipeline knobs. Reference: main.py:56-57, dataloader.py."""

    path_data: str = "data"
    path_metadata: Optional[str] = None      # defaults to {path_data}/metadata
    stats_path: str = "stats_experiments.json"
    channels: Sequence[int] = (1, 2, 3, 4, 5, 6)
    src_size: int = SRC_SIZE
    crop_size: int = CROP_SIZE
    image_ext: str = "jpeg"                  # "jpeg" (reference) or "png" (no offline re-encode)
    cache_bytes_in_ram: bool = True          # reference dataloader.py:55-62 behavior
    decoder_threads: int = 0                 # 0 -> os.cpu_count()
    prefetch_depth: int = 2                  # double buffering of device batches
    use_native_decoder: bool = True          # C++/libjpeg batch decoder; falls back to cv2

    def __post_init__(self):
        if self.path_metadata is None:
            self.path_metadata = os.path.join(self.path_data, "metadata")


@dataclasses.dataclass
class ModelConfig:
    """Reference: models.py:7-39."""

    backbone: str = "resnet50"               # resnet18|resnet50|densenet121
    nb_classes: int = NB_CLASSES
    size_features: int = 1024                # models.py:10
    dropout: float = 0.3                     # models.py:11
    pretrained: bool = True                  # 6-ch stem init rule applies when weights supplied
    pretrained_path: Optional[str] = None    # torch resnet50 state_dict to port (offline)
    head: str = "mlp"                        # "mlp" (reference) or "arcface" (BASELINE config 4)
    arcface_margin: float = 0.3
    arcface_scale: float = 30.0
    control_calibration: bool = False        # neg-control embedding calibration (config 4)
    compute_dtype: str = "bfloat16"          # MXU-native
    param_dtype: str = "float32"
    # Fused Pallas bottleneck blocks for stride-1 ResNet stages in train
    # mode (rxtpu.ops.fused_block). None = auto (currently off: measured
    # slower than XLA's composition on v5e — see OPTIMIZATION.md).
    fuse_blocks: Optional[bool] = None


@dataclasses.dataclass
class TrainConfig:
    """Reference HYPERPARAMS: main.py:42-54,67-73."""

    nb_epochs: int = 100                     # main.py:45
    bs_per_device: int = 16                  # main.py:47
    momentum: float = 0.9                    # main.py:48
    nesterov: bool = True                    # main.py:49
    weight_decay: float = 3e-5               # main.py:50
    lr: Optional[float] = None               # None -> 0.0005 * global_bs (main.py:70-73)
    scheduler: bool = True                   # cosine, eta_min = lr/100 (train.py:104-108)
    early_stopping: bool = False             # main.py:51
    patience: int = 10                       # main.py:52
    train_split_by_experiment: bool = False  # main.py:43
    val_fraction: float = 0.1                # main.py:108-113
    split_seed: int = 42                     # main.py:112
    seed: int = 0
    nb_examples: Optional[int] = None        # debug cap (main.py:54,115-117)
    freeze_head_only_epochs: int = 2         # epochs 1-2 head-only when pretrained (train.py:46-67)
    augment_backend: str = "shear"           # "shear" (TPU-fast) | "gather" (exact warp)
    log_every_steps: int = 50
    checkpoint_backend: str = "pickle"       # "pickle" | "orbax" (pod-scale)
    # preemption safety: also roll the resume checkpoint every N train
    # steps (mid-epoch); resume replays the exact remaining batch stream
    checkpoint_every_steps: Optional[int] = None
    checkpoint_dir: str = "models"
    board_dir: str = "board"


@dataclasses.dataclass
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    experiment_id: Optional[str] = None
    debug: bool = False
    local: bool = False                      # debug and no accelerator (main.py:41)

    def __post_init__(self):
        if self.experiment_id is None:
            # Reference main.py:37-39: timestamp-derived id.
            eid = str(datetime.datetime.now().time())
            self.experiment_id = eid.replace(":", "-").split(".")[0]

    @property
    def checkpoint_path(self) -> str:
        # Reference main.py:95: models/best_model_{experiment_id}.pth
        return os.path.join(
            self.train.checkpoint_dir, f"best_model_{self.experiment_id}.ckpt"
        )


def debug_overrides(cfg: Config, local: bool) -> Config:
    """Reference main.py:41-54: local (=debug on CPU) shrinks everything."""
    cfg.local = local
    cfg.debug = True
    if local:
        cfg.model.pretrained = False
        cfg.train.nb_epochs = 5
        cfg.train.bs_per_device = 2
    cfg.train.nb_examples = cfg.train.bs_per_device
    return cfg


def global_batch_size(cfg: Config, n_devices: int) -> int:
    """main.py:67: bs scales with device count."""
    return cfg.train.bs_per_device * n_devices


def resolve_lr(cfg: Config, n_devices: int) -> float:
    """main.py:70-73: lr = 0.0005 * global batch unless overridden."""
    if cfg.train.lr is not None:
        return cfg.train.lr
    return 0.0005 * global_batch_size(cfg, n_devices)
