"""Task-module wrapper: the reference's SegmentationModule surface
(/root/reference/models/models.py:80-109) as a functional facade.

Three modes, routed explicitly instead of via the reference's sentinel
`segSize` argument (None=train / True=test / tuple=inference):
  train(...)     -> (loss, (acc, jaccard))   [train branch :89-93]
  predict(...)   -> softmax probs (+ attention maps)  [test branch :96-102]
  infer_loss(...)-> (probs, loss)            [inference branch :105-109]

Each method is a pure function of (variables, batch) and jit-safe; the class
only carries static configuration (model, class count, loss weights).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..train.losses import DEFAULT_CLASS_WEIGHTS, dual_loss
from ..train.metrics import pixel_acc


class SegmentationModule:
    def __init__(self, model, num_class: int = 4,
                 class_weights: Sequence[float] = DEFAULT_CLASS_WEIGHTS):
        self.model = model
        self.num_class = num_class
        self.class_weights = tuple(class_weights)

    def train(self, variables, batch, mutable=("batch_stats",)):
        """Forward + loss + in-graph metrics; returns
        ((loss, (acc, jaccard)), new_model_state)."""
        (seg, edge), mut = self.model.apply(
            variables, batch["image"], train=True, mutable=list(mutable))
        loss, _ = dual_loss(seg, edge, batch["label"], batch["edge"],
                            self.class_weights)
        preds = jnp.argmax(seg, axis=-1)
        acc, jaccard = pixel_acc(preds, batch["label"], self.num_class)
        return (loss, (acc, jaccard)), mut

    def predict(self, variables, image, return_att: bool = False):
        if return_att:
            seg, edge, atts = self.model.apply(
                variables, image, train=False, return_att=True)
            return jax.nn.softmax(seg, axis=-1), atts
        seg, edge = self.model.apply(variables, image, train=False)
        return jax.nn.softmax(seg, axis=-1)

    def infer_loss(self, variables, batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        seg, edge = self.model.apply(variables, batch["image"], train=False)
        loss, _ = dual_loss(seg, edge, batch["label"], batch["edge"],
                            self.class_weights)
        return jax.nn.softmax(seg, axis=-1), loss
