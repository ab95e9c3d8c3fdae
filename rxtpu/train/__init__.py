from rxtpu.train.step import (  # noqa: F401
    TrainState,
    make_train_step,
    make_eval_step,
    make_predict_step,
    make_scanned_eval_step,
    make_scanned_predict_step,
    cross_entropy,
)
from rxtpu.train.optim import (  # noqa: F401
    make_optimizer,
    cosine_epoch_schedule,
    head_only_mask,
    apply_freeze_mask,
    backbone_trainable_at_epoch,
)
from rxtpu.train.loop import (  # noqa: F401
    TrainResult,
    evaluate,
    last_checkpoint_path,
    run_training,
)
from rxtpu.train.setup import build_model, create_train_state  # noqa: F401
from rxtpu.train.checkpoint import (  # noqa: F401
    BestCheckpointer,
    save_checkpoint,
    load_checkpoint,
    checkpoint_exists,
)
from rxtpu.train.metrics import MetricLogger, StepTimer  # noqa: F401
