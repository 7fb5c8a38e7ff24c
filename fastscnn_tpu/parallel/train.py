"""Sharded training / eval steps.

TPU-native port of the reference training loop's inner step
(reference:train.py:253-306): one jitted program does

  images (uint8, batch-sharded) → on-device normalize → bf16 forward
  (training-mode BN with global moments = sync-BN) → loss (Dice/OHEM-CE/
  Focal-Dice with aux blending) → grads (f32 master params) → SGD+momentum
  / AdamW update with per-iteration poly LR.

The reference's AMP (GradScaler/autocast, reference:train.py:201-275)
maps to bf16 compute with f32 master weights — no loss scaling needed on
TPU since bf16 has f32's exponent range.

All cross-device communication (gradient psum over 'data', halo
exchanges if 'space' > 1) is inserted by XLA from the sharding
annotations; there is no hand-written collective here by design.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from fastscnn_tpu.engine.infer import IMAGENET_MEAN, IMAGENET_STD
from fastscnn_tpu.models.fast_scnn import FastSCNN
from fastscnn_tpu.ops.resize import resize_bilinear_matmul
from fastscnn_tpu.utils.metric import seg_hist_update

from fastscnn_tpu.utils.profiling import enable_compilation_cache

# Persistent XLA compilation cache: on for every compute path.
enable_compilation_cache()

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_split_aug_train_step",
    "make_eval_step",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Carried training state: f32 master params, BN running stats,
    optimizer state, step counter."""

    params: Any
    model_state: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(
    name: str = "sgd",
    schedule: Callable | float = 1e-2,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """'sgd': SGD+momentum with torch-style coupled weight decay
    (reference:train.py:195-198); 'adamw': the BDD100K trainer's choice
    (reference:train_bdd100k.py:183-185)."""
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate=schedule, momentum=momentum),
        )
    if name == "adamw":
        return optax.adamw(learning_rate=schedule, weight_decay=weight_decay)
    raise ValueError(f"unknown optimizer {name!r}")


def create_train_state(model: FastSCNN, optimizer, key=None, params=None, model_state=None) -> TrainState:
    if params is None:
        params, model_state = model.init(key)
    return TrainState(
        params=params,
        model_state=model_state,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _normalize(images, mean, std, dtype):
    x = images.astype(dtype) * jnp.asarray(1.0 / 255.0, dtype)
    if mean is not None:
        x = (x - jnp.asarray(mean, dtype)) / jnp.asarray(std, dtype)
    return x


def make_train_step(
    model: FastSCNN,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    mesh=None,
    compute_dtype=jnp.bfloat16,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    spatial_shard: bool = False,
    grad_accum: int = 1,
    device_aug=None,
    jit: bool = True,
    donate_batch: bool = False,
):
    """Build the jitted sharded train step.

    ``donate_batch``: additionally donate the images/targets buffers to
    the program — correct only when the caller never reuses them (the
    split device-aug path hands freshly-augmented arrays in; freeing
    them during the step lowers peak HBM by the batch size).

    step(state, images_u8, targets_i32, rng) -> (state, {'loss': f32})

    ``device_aug``: optional ``augment(images, masks, key)`` built by
    :func:`fastscnn_tpu.data.device_aug.make_device_augment`. When set,
    the step takes *native-resolution* uint8 images and
    label-transformed masks and performs the PSP augmentation chain on
    device (batched MXU sampling matmuls) before normalization — the
    host's only per-record work is decode (or decoded-cache memcpy) and
    batch assembly. Per-sample randomness comes from the step ``rng``.
    Incompatible with ``spatial_shard`` (the aug matmuls mix rows
    across the sharded H axis); dp-sharding is preserved (all aug ops
    are batch-leading).

    With ``mesh``: images/targets sharded batch-wise over 'data' (and H
    over 'space' when ``spatial_shard``), state replicated.

    ``grad_accum`` > 1 splits each step's batch into that many
    sequential microbatches inside the jitted program (``lax.scan``):
    activation memory drops to batch/grad_accum while the optimizer
    applies the mean of the microbatch gradients — train effective
    batches whose activations would OOM HBM. This is torch-style
    gradient accumulation (one ``loss.backward()`` per microbatch): for
    per-pixel separable losses it equals the full-batch gradient; for
    batch-aggregated losses (dice denominators, OHEM top-k mining,
    ignore-aware normalization) it is the mean of per-microbatch
    objectives, exactly as if the microbatches were separate steps
    sharing one optimizer update. BN running stats are threaded through
    the microbatches sequentially. Each microbatch keeps the full
    ('data'[, 'space']) sharding, so data parallelism is preserved
    (asserted on the compiled HLO in
    tests/test_parallel.py::test_grad_accum_on_dp_mesh).
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    if device_aug is not None and spatial_shard:
        raise ValueError("device_aug is incompatible with spatial_shard")

    img_spec = ["data", None, None, None]
    tgt_spec = ["data", None, None]
    if mesh is not None and spatial_shard and mesh.shape.get("space", 1) > 1:
        img_spec[1] = "space"
        tgt_spec[1] = "space"

    def grads_of(params, model_state, x, targets, rng):
        def loss_of(p):
            cast = jax.tree_util.tree_map(lambda q: q.astype(compute_dtype), p)
            # Low-res logits out of the network; the loss performs the final
            # align_corners=True upsample itself (identical semantics, and
            # narrow-C losses avoid the lane-padded full-res tensor).
            outputs, new_model_state = model.apply(
                cast, model_state, x, training=True, rng=rng,
                upsample_outputs=False,
            )
            loss = loss_fn(outputs, targets)
            return loss.astype(jnp.float32), new_model_state

        (loss, new_model_state), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
        return loss, new_model_state, grads

    def step(state: TrainState, images, targets, rng):
        aug_key = jax.random.fold_in(rng, 0x617567) if device_aug is not None else None
        if grad_accum == 1:
            if device_aug is not None:
                images, targets = device_aug(images, targets, aug_key)
            x = _normalize(images, mean, std, compute_dtype)
            loss, new_model_state, grads = grads_of(
                state.params, state.model_state, x, targets, rng
            )
        else:
            if images.shape[0] % grad_accum:
                raise ValueError(
                    f"batch {images.shape[0]} not divisible by grad_accum {grad_accum}"
                )
            mb = images.shape[0] // grad_accum
            # Leading-axis reshape + scan (NOT dynamic_slice with a traced
            # start: GSPMD cannot keep a traced-offset slice of the
            # batch-sharded axis partitioned — it all-gathers the inputs
            # and replicates every microbatch on every device). The
            # explicit constraint re-shards each microbatch over
            # ('data'[, 'space']); the one-off uint8 redistribute is
            # cheap. Normalization happens per-microbatch inside the scan
            # so no full-batch compute_dtype tensor stays live.
            xr = images.reshape(grad_accum, mb, *images.shape[1:])
            tr = targets.reshape(grad_accum, mb, *targets.shape[1:])
            if mesh is not None:
                xr = jax.lax.with_sharding_constraint(
                    xr, NamedSharding(mesh, P(None, *img_spec))
                )
                tr = jax.lax.with_sharding_constraint(
                    tr, NamedSharding(mesh, P(None, *tgt_spec))
                )

            def micro(carry, xs):
                i, xi_u8, ti = xs
                model_state, grad_acc, loss_acc = carry
                if device_aug is not None:
                    xi_u8, ti = device_aug(xi_u8, ti, jax.random.fold_in(aug_key, i))
                xi = _normalize(xi_u8, mean, std, compute_dtype)
                loss, model_state, grads = grads_of(
                    state.params, model_state, xi, ti, jax.random.fold_in(rng, i)
                )
                grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
                return (model_state, grad_acc, loss_acc + loss), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (new_model_state, grads, loss_sum), _ = jax.lax.scan(
                micro,
                (state.model_state, zeros, jnp.zeros((), jnp.float32)),
                (jnp.arange(grad_accum), xr, tr),
            )
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grads)
            loss = loss_sum / grad_accum

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss}

    if not jit:
        # the raw traceable step, for callers that embed it in a larger
        # jitted program (bench_train's on-device fori_loop, which
        # amortizes the sandbox relay's ~10 ms/dispatch host overhead)
        if mesh is not None:
            raise ValueError("jit=False is single-device only")
        return step

    donate = (0, 1, 2) if donate_batch else (0,)
    if mesh is None:
        return jax.jit(step, donate_argnums=donate)

    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        donate_argnums=donate,
        in_shardings=(
            repl,
            NamedSharding(mesh, P(*img_spec)),
            NamedSharding(mesh, P(*tgt_spec)),
            repl,
        ),
        out_shardings=(repl, repl),
    )


def make_split_aug_train_step(
    model: FastSCNN,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    device_aug: Callable,
    mesh=None,
    compute_dtype=jnp.bfloat16,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    grad_accum: int = 1,
    donate: bool = True,
):
    """Two-program variant of ``make_train_step(device_aug=...)``.

    The aug chain compiles as its OWN jitted program whose output feeds
    the standard crop-fed train step — two dispatches per step instead of
    one. Exists because the fused native-resolution program can exceed
    the compile-memory ceiling at large batch (the bs96 `--device-aug`
    compile wall, docs/PERFORMANCE.md "CE-19 sweep"): each half is the
    size of a program that already compiles (the aug alone; the bs96
    crop-fed step). Costs one extra HBM round-trip of the augmented
    batch (~2 ms at bs96×768²f32 on v5e) plus a dispatch.

    Semantics: identical per-sample draws to the fused path at
    ``grad_accum=1`` (same ``fold_in(rng, 0x617567)`` aug key). With
    ``grad_accum>1`` the fused path re-draws per microbatch
    (``fold_in(aug_key, i)``) while this path draws once for the whole
    batch — same distribution, different stream.

    ``donate``: donate the native-resolution input buffers to the aug
    program (each training batch is fresh host data; donation frees the
    largest buffer in the pipeline). Pass False if the caller reuses the
    arrays (benchmarks).
    """
    if mesh is not None and mesh.shape.get("space", 1) > 1:
        raise ValueError("device_aug is incompatible with spatial sharding")

    def aug_of(images, targets, rng):
        # aug-key derivation inside the jitted program: doing the
        # fold_in eagerly would be a third device dispatch per step
        # (~10 ms on a tunneled device)
        return device_aug(images, targets, jax.random.fold_in(rng, 0x617567))

    if mesh is None:
        aug_jit = jax.jit(aug_of, donate_argnums=(0, 1) if donate else ())
    else:
        data_spec = NamedSharding(mesh, P("data", None, None, None))
        tgt_sharding = NamedSharding(mesh, P("data", None, None))
        aug_jit = jax.jit(
            aug_of,
            donate_argnums=(0, 1) if donate else (),
            in_shardings=(data_spec, tgt_sharding, NamedSharding(mesh, P())),
            out_shardings=(data_spec, tgt_sharding),
        )
    # The inner step donates the augmented images/targets (freshly made
    # by aug_jit each step, never reused): freeing them during the step
    # lowers peak HBM — the binding resource at the bs96 wall.
    step = make_train_step(
        model, loss_fn, optimizer, mesh=mesh, compute_dtype=compute_dtype,
        mean=mean, std=std, grad_accum=grad_accum, donate_batch=True,
    )

    def split_step(state, images, targets, rng):
        imgs, tgts = aug_jit(images, targets, rng)
        return step(state, imgs, tgts, rng)

    return split_step


def make_eval_step(
    model: FastSCNN,
    num_classes: int,
    mesh=None,
    compute_dtype=jnp.bfloat16,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    jit: bool = True,
    per_sample_stats: bool = False,
    pred_dtype=jnp.int32,
):
    """Jitted eval step: forward (eval-mode BN) → argmax → metric
    sufficient statistics (the device-histogram port of
    reference:utils/metric.py:86-105; the sums double as the psum over
    the mesh). ``jit=False`` returns the raw traceable step (single-device
    only) for callers that embed it in a larger jitted program
    (bench_eval's on-device fori_loop). ``per_sample_stats``: emit
    (B,)-leading statistics so the eval protocol's per-image cumulative
    metric needs no host-side recomputation. ``pred_dtype``: dtype of
    the returned mask — uint8 is lossless for ≤255 classes and quarters
    the device→host transfer (the dominant eval-protocol cost on a
    tunneled device; the histogram is computed on device before the
    cast, so metrics are unaffected)."""

    def step(params, model_state, images, targets):
        x = _normalize(images, mean, std, compute_dtype)
        cast = jax.tree_util.tree_map(lambda p: p.astype(compute_dtype), params)
        # Low-res logits + interp-matmul final upsample: same bilinear
        # weights as the in-model gather path but on the MXU (~2.7× E2E
        # on TPU — docs/PERFORMANCE.md); near-tie argmax flips only.
        outputs, _ = model.apply(
            cast, model_state, x, training=False, upsample_outputs=False
        )
        logits = outputs[0]
        if logits.shape[1:3] != x.shape[1:3]:
            logits = resize_bilinear_matmul(
                logits, (x.shape[1], x.shape[2]), align_corners=True
            )
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        correct, labeled, inter, union = seg_hist_update(
            pred, targets, num_classes, per_sample=per_sample_stats
        )
        return pred.astype(pred_dtype), (correct, labeled, inter, union)

    if not jit:
        if mesh is not None:
            raise ValueError("jit=False is single-device only")
        return step
    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(
            repl,
            repl,
            NamedSharding(mesh, P("data", None, None, None)),
            NamedSharding(mesh, P("data", None, None)),
        ),
    )
