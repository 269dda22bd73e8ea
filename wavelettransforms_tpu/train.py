"""Prune-aware training / fine-tuning on a device mesh.

The reference is a one-shot compression study with no training loop; this
module supplies the natural production workflow around it — prune-then-
finetune — as a TPU-native jitted train step:

  * cross-entropy objective on the flax ResNet family (``models/resnet.py``);
  * optax SGD-with-momentum (or any optax tx), BN batch_stats updated the
    flax way;
  * **sparsity-preserving masks**: positions pruned by any method in
    ``prune/`` stay exactly zero through every update (mask applied to both
    gradients and post-update params);
  * data parallel x tensor parallel over a named mesh via GSPMD sharding
    annotations — conv kernels and dense layers shard their output-channel
    axis over 'tp', the batch shards over 'dp'; XLA inserts the collectives.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def cross_entropy_loss(logits, labels):
    """Mean CE over the batch (integer labels) — the eval suite's loss
    semantics (/root/reference/ResNet/testing_suite/eval_model.py:50-52)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(ll)


def sparsity_mask(params):
    """Boolean pytree aligned with ``params``: False where a conv kernel
    entry is exactly zero (pruned — frozen at zero through training), True
    everywhere else (biases/BN always trainable even when initialized to 0)."""
    def leaf(path, p):
        names = [getattr(q, "key", getattr(q, "name", "")) for q in path]
        if names and names[-1] == "kernel" and p.ndim == 4:
            return p != 0
        return jnp.ones_like(p, dtype=bool)
    return jax.tree_util.tree_map_with_path(leaf, params)


def make_train_state(model, rng, sample_batch, tx=None,
                     learning_rate: float = 0.01, momentum: float = 0.9):
    variables = model.init(rng, sample_batch, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = tx or optax.sgd(learning_rate, momentum=momentum)
    return {
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }, tx


def train_step(model, tx, state, images, labels, mask_tree=None):
    """One SGD step; returns (new_state, metrics).  ``mask_tree`` (optional)
    is a pytree aligned with params['...'] leaves (True = trainable)."""

    def loss_fn(params):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": state["batch_stats"]},
            images, train=True, mutable=["batch_stats"])
        loss = cross_entropy_loss(logits, labels)
        return loss, (logits, mutated["batch_stats"])

    (loss, (logits, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state["params"])
    if mask_tree is not None:
        grads = jax.tree_util.tree_map(
            lambda g, m: g * m.astype(g.dtype) if m is not None else g,
            grads, mask_tree,
            is_leaf=lambda x: x is None)
    updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
    params = optax.apply_updates(state["params"], updates)
    if mask_tree is not None:
        params = jax.tree_util.tree_map(
            lambda p, m: p * m.astype(p.dtype) if m is not None else p,
            params, mask_tree,
            is_leaf=lambda x: x is None)
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    new_state = {"params": params, "batch_stats": new_stats,
                 "opt_state": new_opt, "step": state["step"] + 1}
    return new_state, {"loss": loss, "accuracy": acc}


# ---------------------------------------------------------------------------
# Mesh-sharded train step (dp x tp)
# ---------------------------------------------------------------------------

def param_partition_spec(path, leaf) -> P:
    """Sharding rule: shard the output-channel axis of conv kernels and dense
    matrices over 'tp'; replicate everything else (BN scalars, biases)."""
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if names and names[-1] == "kernel":
        if leaf.ndim == 4:   # (kh, kw, in, out)
            return P(None, None, None, "tp")
        if leaf.ndim == 2:   # (in, out)
            return P(None, "tp")
    return P()


def shard_state(state, mesh: Mesh):
    """Place a train state on the mesh with tp-sharded kernels."""
    def place(path, leaf):
        spec = param_partition_spec(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    out = dict(state)
    out["params"] = jax.tree_util.tree_map_with_path(place, state["params"])
    # optimizer state mirrors params (momentum buffers live under the same
    # trailing path keys, e.g. …trace…/kernel), so the same rule shards them
    # identically to their parameters; scalar leaves (step counts) replicate.
    out["opt_state"] = jax.tree_util.tree_map_with_path(
        place, state["opt_state"])
    out["batch_stats"] = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())),
        state["batch_stats"])
    return out


def make_sharded_train_step(model, tx, mesh: Mesh, donate: bool = True):
    """jit the train step with dp-sharded batch; GSPMD propagates the tp
    shardings from the parameter placements."""
    batch_sharding = NamedSharding(mesh, P("dp"))

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state, images, labels, mask_tree=None):
        return train_step(model, tx, state, images, labels, mask_tree)

    def run(state, images, labels, mask_tree=None):
        images = jax.device_put(images, batch_sharding)
        labels = jax.device_put(labels, batch_sharding)
        return step(state, images, labels, mask_tree)

    return run
