from .losses import (
    DEFAULT_CLASS_WEIGHTS,
    dice_loss,
    dual_loss,
    edge_attention_loss,
    edge_bce,
    image_based_cross_entropy,
    label_smooth_softmax_ce,
    weighted_cross_entropy,
)
from .metrics import (
    accuracy,
    dice_coefficient,
    intersection_and_union,
    pixel_acc,
)
from .optim import (
    adamw,
    cosine_epoch_schedule,
    create_optimizer,
    decay_mask,
    plain_radam,
    radam,
    scale_by_radam,
)
from .checkpoint import (
    BestIoUPolicy,
    restore_checkpoint,
    restore_params_only,
    save_checkpoint,
)
from .state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_infer_step,
    make_train_step,
)
