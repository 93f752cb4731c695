from tpuseg.train.loss import cross_entropy_loss
from tpuseg.train.metrics import (
    confusion_matrix,
    iou_from_confusion,
    pixel_accuracy_from_confusion,
)
from tpuseg.train.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from tpuseg.train.trainer import Trainer

__all__ = [
    "cross_entropy_loss",
    "confusion_matrix",
    "iou_from_confusion",
    "pixel_accuracy_from_confusion",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "Trainer",
]
