"""Loss numerics vs torch golden values (the reference's loss stack,
/root/reference/loss.py:51-88,125-159)."""
import numpy as np
import pytest

import jax.numpy as jnp

from saunet_tpu.train.losses import (
    dice_loss, dual_loss, edge_bce, weighted_cross_entropy,
)

torch = pytest.importorskip("torch")


@pytest.fixture
def case():
    rng = np.random.RandomState(42)
    logits = rng.randn(2, 8, 8, 4).astype(np.float32)
    labels = rng.randint(0, 4, size=(2, 8, 8))
    edge_logits = rng.randn(2, 8, 8, 1).astype(np.float32)
    edge_t = (rng.rand(2, 8, 8, 1) > 0.7).astype(np.float32)
    return logits, labels, edge_logits, edge_t


def test_weighted_ce_matches_torch(case):
    logits, labels, _, _ = case
    ours = float(weighted_cross_entropy(jnp.asarray(logits),
                                        jnp.asarray(labels)))
    lt = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    yt = torch.from_numpy(labels).long()
    ce = torch.nn.CrossEntropyLoss(
        weight=torch.tensor([1.0, 4.0, 5.0, 1.0]))(lt, yt)
    assert abs(ours - float(ce)) < 1e-5


def test_dice_matches_reference_formula(case):
    logits, labels, _, _ = case
    ours = float(dice_loss(jnp.asarray(labels), jnp.asarray(logits)))

    # reference formula (loss.py:80-88) in torch
    lt = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    yt = torch.from_numpy(labels).long()
    one_hot = torch.eye(4)[yt].permute(0, 3, 1, 2).float()
    probas = torch.nn.functional.softmax(lt, dim=1)
    dims = (0, 2, 3)
    inter = torch.sum(probas * one_hot, dims)
    card = torch.sum(probas + one_hot, dims)
    ref = 1 - (2.0 * inter / (card + 1e-7)).mean()
    assert abs(ours - float(ref)) < 1e-6


def test_edge_bce_matches_torch(case):
    _, _, edge_logits, edge_t = case
    probs = 1.0 / (1.0 + np.exp(-edge_logits))
    ours = float(edge_bce(jnp.asarray(probs), jnp.asarray(edge_t)))
    ref = torch.nn.BCELoss()(torch.from_numpy(probs),
                             torch.from_numpy(edge_t))
    assert abs(ours - float(ref)) < 1e-5


def test_dual_loss_is_sum(case):
    logits, labels, edge_logits, edge_t = case
    probs = 1.0 / (1.0 + np.exp(-edge_logits))
    total, parts = dual_loss(jnp.asarray(logits), jnp.asarray(probs),
                             jnp.asarray(labels), jnp.asarray(edge_t))
    assert abs(float(total) -
               (float(parts["ce"]) + float(parts["dice"]) +
                float(parts["edge"]))) < 1e-6
