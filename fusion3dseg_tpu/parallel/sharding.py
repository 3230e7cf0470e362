"""Device-mesh sharding for the 2D segmenter: dp x tp GSPMD training step.

The reference has zero distribution (SURVEY.md §2 parallelism statement);
this layer is new design. Model parameters carry logical axis names
(models/segformer.py: 'embed' stays replicated, 'hidden' — attention
heads / FFN hidden — shards tensor-parallel); batches shard data-parallel.
jit + NamedSharding lets XLA's SPMD partitioner insert the all-reduces over
ICI (the scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert collectives).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# logical axis -> mesh axis
LOGICAL_RULES = (("embed", None), ("hidden", "tp"), ("batch", "dp"))


def make_mesh(
    n_devices: Optional[int] = None, tp: Optional[int] = None, devices=None
) -> Mesh:
    """Build a (dp, tp) mesh. tp defaults to min(4, largest power-of-two
    divisor); dp gets the rest. Lay tp innermost so its collectives ride
    adjacent ICI links."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if tp is None:
        tp = 1
        while tp < 4 and n % (tp * 2) == 0:
            tp *= 2
    dp = n // tp
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


def param_shardings(mesh: Mesh, variables) -> Any:
    """NamedShardings for a (possibly nn.Partitioned-boxed) param pytree."""
    spec = nn.get_partition_spec(variables)
    return nn.logical_to_mesh_sharding(spec, mesh, LOGICAL_RULES)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, weights: Optional[jax.Array] = None
) -> jax.Array:
    """Mean softmax cross entropy; logits [B,H,W,C] f32, labels [B,H,W] int.

    `weights` (same shape as labels, f32) turns it into a weighted mean
    sum(w·nll)/sum(w) — weights=None and all-ones weights are identical."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if weights is None:
        return -jnp.mean(ll)
    return -jnp.sum(ll * weights) / jnp.sum(weights)


def boundary_mask(labels: jax.Array) -> jax.Array:
    """True where any 4-neighbor's label differs — both sides of every label
    edge. Static-slice shift compares only (no gathers); labels [B,H,W] int."""
    m = jnp.zeros(labels.shape, bool)
    dv = labels[:, 1:, :] != labels[:, :-1, :]
    dh = labels[:, :, 1:] != labels[:, :, :-1]
    m = m.at[:, 1:, :].max(dv)
    m = m.at[:, :-1, :].max(dv)
    m = m.at[:, :, 1:].max(dh)
    m = m.at[:, :, :-1].max(dh)
    return m


def make_train_step(
    model: nn.Module,
    optimizer: optax.GradientTransformation,
    boundary_weight: float = 1.0,
    ema_decay: float = 0.0,
):
    """Returns train_step(params, opt_state, images, labels) -> (params,
    opt_state, loss). Pure function of boxed (Partitioned) params so sharding
    metadata flows through jit.

    boundary_weight > 1 up-weights pixels on either side of a ground-truth
    label edge in the loss by that factor. Motivation (docs/ROUND4.md):
    70% of model-in-the-loop 3D disagreements touch a predicted-mask
    boundary pixel (2D error 30% at boundaries vs 2.3% interior), and
    decision-rule fixes were measured flat — the edge band is where the
    remaining trainable error lives.

    ema_decay > 0 switches the signature to train_step(params, opt_state,
    ema, images, labels) -> (params, opt_state, ema, loss): an exponential
    moving average of the params, updated INSIDE the step program — a
    separate EMA dispatch would cost 30-90 ms of tunnel latency per step
    on this platform. The EMA tree is the evaluation/export checkpoint
    (standard segmentation practice; averages away late-schedule noise)."""

    def loss_fn(params, images, labels):
        # integer images are normalized on-device: the host->device hop is
        # tunnel/PCIe-bandwidth-bound, so datasets ship uint8 (4x smaller)
        # and the cast fuses into the first conv's input read
        if jnp.issubdtype(images.dtype, jnp.integer):
            images = images.astype(jnp.float32) / 255.0
        logits = model.apply({"params": params}, images)
        labels = labels.astype(jnp.int32)
        weights = None
        if boundary_weight != 1.0:
            weights = jnp.where(
                boundary_mask(labels), jnp.float32(boundary_weight), 1.0
            )
        return cross_entropy_loss(logits, labels, weights)

    def train_step(params, opt_state, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if ema_decay <= 0.0:
        return train_step

    d = jnp.float32(ema_decay)

    def train_step_ema(params, opt_state, ema, images, labels):
        params, opt_state, loss = train_step(params, opt_state, images, labels)
        ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema, params)
        return params, opt_state, ema, loss

    return train_step_ema


def init_sharded_train(
    model: nn.Module,
    mesh: Mesh,
    input_hw: Tuple[int, int] = (64, 64),
    learning_rate: float = 1e-4,
    rng: int = 0,
    optimizer: Optional[optax.GradientTransformation] = None,
    boundary_weight: float = 1.0,
    ema_decay: float = 0.0,
):
    """Initialize params + optimizer state with mesh shardings applied and
    return (params, opt_state, jitted_train_step, shardings dict).

    ema_decay > 0 changes the step signature (see make_train_step) and adds
    an "ema_init" jitted copy-params program to the shardings dict — the
    caller seeds the EMA tree with it (a plain `ema = params` would alias
    the donated params buffer).

    `optimizer` overrides the default adamw(learning_rate) — e.g. a
    warmup-cosine schedule built by models/train.py. Its state must follow
    the usual optax convention (subtrees structurally matching the param
    tree, like adam's mu/nu, inherit the param shardings; everything else
    replicates).

    The jitted step has in/out shardings pinned: params/opt-state on their
    tp layout, batch on dp — the full dp x tp training step the multi-chip
    dryrun compiles (see __graft_entry__.dryrun_multichip).
    """
    optimizer = optimizer or optax.adamw(learning_rate)

    def init_fn(key):
        dummy = jnp.zeros((1, *input_hw, 3), jnp.float32)
        variables = model.init(key, dummy)
        params = nn.meta.unbox(variables["params"])  # plain arrays downstream
        opt_state = optimizer.init(params)
        return params, opt_state

    key = jax.random.PRNGKey(rng)
    # trace once (with boxes) to learn the logical specs, then init directly
    # into the mesh layouts
    boxed_shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, *input_hw, 3), jnp.float32)), key
    )
    pspec = nn.get_partition_spec(boxed_shapes)["params"]
    psharding = nn.logical_to_mesh_sharding(pspec, mesh, LOGICAL_RULES)
    # adam moments mirror the param shardings: any opt-state subtree whose
    # structure matches the param tree (mu, nu) gets psharding; scalars and
    # everything else replicate
    oshapes = jax.eval_shape(init_fn, key)[1]
    ptreedef = jax.tree.structure(psharding)

    def shard_opt_state(subtree):
        if jax.tree.structure(subtree) == ptreedef:
            return psharding
        return jax.tree.map(lambda _: replicated(mesh), subtree)

    osharding = jax.tree.map(
        shard_opt_state, oshapes,
        is_leaf=lambda x: jax.tree.structure(x) == ptreedef
        if not isinstance(x, jax.ShapeDtypeStruct) else True,
    )

    init_jit = jax.jit(init_fn, out_shardings=(psharding, osharding))
    params, opt_state = init_jit(key)

    raw_step = make_train_step(
        model, optimizer, boundary_weight=boundary_weight, ema_decay=ema_decay
    )
    shardings = {
        "params": psharding,
        "opt_state": osharding,
        "data": data_sharding(mesh),
    }
    if ema_decay > 0.0:
        step = jax.jit(
            raw_step,
            in_shardings=(psharding, osharding, psharding,
                          data_sharding(mesh), data_sharding(mesh)),
            out_shardings=(psharding, osharding, psharding, replicated(mesh)),
            donate_argnums=(0, 1, 2),
        )
        shardings["ema_init"] = jax.jit(
            lambda p: jax.tree.map(jnp.copy, p), out_shardings=psharding
        )
    else:
        step = jax.jit(
            raw_step,
            in_shardings=(psharding, osharding,
                          data_sharding(mesh), data_sharding(mesh)),
            out_shardings=(psharding, osharding, replicated(mesh)),
            donate_argnums=(0, 1),
        )
    return params, opt_state, step, shardings
