#!/usr/bin/env python
"""Training-throughput benchmark (companion to bench.py).

Measures full train-step throughput (forward + backward + optimizer +
sync-BN) on synthetic data with the reference's TuSimple configuration
(480² crops, dice+aux loss — reference baseline: 232.9 samples/s on a
dev GPU at bs 8 fp16, PERFORMANCE_MONITORING.md:73-79).

Protocol: on-device fori_loop of train steps (see bench.py for why).
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from fastscnn_tpu.losses import get_loss_fn
    from fastscnn_tpu.models import FastSCNN
    from fastscnn_tpu.parallel import create_train_state, make_optimizer
    from fastscnn_tpu.parallel.train import _normalize
    from fastscnn_tpu.utils import lr_schedule

    crop = int(os.environ.get("BENCH_TRAIN_CROP", "480"))
    batches = [int(b) for b in os.environ.get("BENCH_TRAIN_BATCHES", "8,64,128").split(",")]
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "20"))
    # The real Cityscapes recipe is 19-class OHEM-CE at 768² bs16
    # (reference:train.py defaults): BENCH_TRAIN_CLASSES=19
    # BENCH_TRAIN_LOSS=ce BENCH_TRAIN_CROP=768 BENCH_TRAIN_BATCHES=16.
    num_classes = int(os.environ.get("BENCH_TRAIN_CLASSES", "2"))
    loss_name = os.environ.get("BENCH_TRAIN_LOSS", "dice")

    # BENCH_TRAIN_DEVICE_AUG=1: feed native-resolution batches and run the
    # aug chain on device inside the step (data/device_aug.py) — the
    # step-time delta vs the crop-fed step is the aug's device cost.
    # BENCH_TRAIN_AUG_CHAIN=psp (default) | custom | custom-ms | original
    # picks the chain (PSP for citys/tusimple/bdd100k; the custom
    # dataset's chain, optionally multi-scale, for the custom recipe;
    # 'original' = bdd100k --keep-original-size flip+blur at native res —
    # the step then trains at BENCH_TRAIN_SRC, not the crop).
    # BENCH_TRAIN_NATIVE=1: no-aug control at native resolution (the
    # honest baseline for the 'original' chain's device cost).
    # BENCH_TRAIN_DEVICE_AUG=2: the SPLIT two-program path
    # (parallel.train.make_split_aug_train_step / train.py
    # --device-aug-split): aug compiles alone, feeding the crop-fed step.
    # Measured per-dispatch (two host dispatches per step — honest about
    # the ~10 ms/dispatch sandbox relay cost, which a directly-attached
    # host does not pay); also prints the aug/step device-time breakdown.
    devaug_env = os.environ.get("BENCH_TRAIN_DEVICE_AUG", "")
    device_aug_on = devaug_env in ("1", "2")
    device_aug_split = devaug_env == "2"
    aug_chain = os.environ.get("BENCH_TRAIN_AUG_CHAIN", "psp")
    native_ctl = os.environ.get("BENCH_TRAIN_NATIVE", "") == "1"
    src_h, src_w = (
        int(x) for x in os.environ.get("BENCH_TRAIN_SRC", "1024x2048").split("x")
    )
    base_size = int(os.environ.get("BENCH_TRAIN_BASE", "1024"))

    # BENCH_TRAIN_SIZE=HxW: non-square host-aug-fed train resolution (the
    # BDD100K drivable recipe trains at 360×640, reference:
    # train_bdd100k.py:124-148 — images resized, not square-cropped).
    # Ignored when device-aug/native feeds BENCH_TRAIN_SRC instead.
    size_env = os.environ.get("BENCH_TRAIN_SIZE", "")
    train_h, train_w = (
        (int(x) for x in size_env.split("x")) if size_env else (crop, crop)
    )
    train_h, train_w = int(train_h), int(train_w)
    # BENCH_TRAIN_OPT=sgd (default) | adamw — the BDD100K trainer's
    # optimizer (reference:train_bdd100k.py:183-185, lr 1e-3).
    opt_name = os.environ.get("BENCH_TRAIN_OPT", "sgd")

    stem_impl = os.environ.get("BENCH_TRAIN_STEM", "xla")
    # BENCH_TRAIN_GRAD_ACCUM=N (N>1): bench the SHIPPED step
    # (parallel.train.make_train_step, jit=False so the fori_loop can
    # embed it) with in-graph microbatching — the --grad-accum trainer
    # path. N=1 keeps the historical inline step for number continuity.
    grad_accum = int(os.environ.get("BENCH_TRAIN_GRAD_ACCUM", "1"))
    model = FastSCNN(num_classes=num_classes, aux=True, stem_impl=stem_impl)
    aug = None
    if device_aug_on:
        if aug_chain == "original":
            from fastscnn_tpu.data.device_aug import make_device_augment_original

            aug = make_device_augment_original(blur_p=0.3)
        elif aug_chain.startswith("custom"):
            from fastscnn_tpu.data.device_aug import make_device_augment_custom

            aug = make_device_augment_custom(
                crop_size=crop, multi_scale=aug_chain == "custom-ms"
            )
        else:
            from fastscnn_tpu.data.device_aug import make_device_augment

            aug = make_device_augment(base_size=base_size, crop_size=crop, pad_label=-1)
    schedule = lr_schedule(
        "poly", base_lr=1e-3 if opt_name == "adamw" else 1e-2,
        niters=10000, power=0.9,
    )
    optimizer = make_optimizer(opt_name, schedule)
    loss_fn = get_loss_fn(loss_name, aux=True, num_classes=num_classes)

    best_sps, best_batch = 0.0, 0
    rng = np.random.default_rng(0)
    for batch in batches:
        in_h, in_w = (
            (src_h, src_w) if device_aug_on or native_ctl else (train_h, train_w)
        )
        images = jnp.asarray(rng.integers(0, 256, (batch, in_h, in_w, 3), dtype=np.uint8))
        # Device-aug feeds NATIVE-res label maps: int8 (lossless for
        # ≤127 classes) like the trainer — quarters the largest batch
        # buffer, the binding HBM at the bs96 device-aug wall.
        tgt_dtype = np.int8 if device_aug_on and num_classes <= 127 else np.int32
        targets = jnp.asarray(
            rng.integers(-1, num_classes, (batch, in_h, in_w)).astype(tgt_dtype)
        )
        state = create_train_state(model, optimizer, key=jax.random.PRNGKey(0))

        if device_aug_split:
            from fastscnn_tpu.parallel import make_split_aug_train_step

            split_step = make_split_aug_train_step(
                model, loss_fn, optimizer, aug, mean=None, std=None,
                compute_dtype=jnp.bfloat16, grad_accum=grad_accum,
                donate=False,
            )
            try:
                state, m = split_step(state, images, targets, jax.random.PRNGKey(1))
                _ = float(m["loss"])  # compile both programs + run once
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for i in range(iters):
                        state, m = split_step(
                            state, images, targets, jax.random.fold_in(jax.random.PRNGKey(1), i)
                        )
                    _ = float(m["loss"])
                    times.append((time.perf_counter() - t0) / iters)
                dt = sorted(times)[1]
                # breakdown: aug program alone, then the crop-fed step alone
                aug_jit = jax.jit(aug)
                ai, at = aug_jit(images, targets, jax.random.PRNGKey(2))
                ai.block_until_ready()
                t0 = time.perf_counter()
                for i in range(iters):
                    ai, at = aug_jit(images, targets, jax.random.fold_in(jax.random.PRNGKey(2), i))
                ai.block_until_ready()
                aug_ms = 1e3 * (time.perf_counter() - t0) / iters
            except Exception as e:
                print(f"batch {batch} (split) failed: {e}", file=sys.stderr)
                # free this batch's device arrays + compiled programs so
                # an OOM here cannot cascade into the next batch size
                import gc

                del state, images, targets
                gc.collect()
                jax.clear_caches()
                continue
            sps = batch / dt
            print(
                f"batch {batch} (split, per-dispatch): {sps:.1f} samples/s "
                f"({dt * 1e3:.2f} ms/step, aug dispatch {aug_ms:.2f} ms incl. "
                "~10 ms relay overhead each)",
                file=sys.stderr,
            )
            if sps > best_sps:
                best_sps, best_batch = sps, batch
            continue

        if grad_accum > 1:
            from fastscnn_tpu.parallel import make_train_step

            real_step = make_train_step(
                model, loss_fn, optimizer, mesh=None, mean=None, std=None,
                compute_dtype=jnp.bfloat16, grad_accum=grad_accum,
                device_aug=aug, jit=False,
            )

            def one_step(state, images, targets, key):
                state, metrics = real_step(state, images, targets, key)
                return state, metrics["loss"]

        else:
            one_step = None  # defined below (the historical inline step)

        def one_step_inline(state, images, targets, key):
            if aug is not None:
                images, targets = aug(images, targets, jax.random.fold_in(key, 0x617567))
            x = _normalize(images, None, None, jnp.bfloat16)

            def loss_of(params):
                cast = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
                # Same contract as parallel.train.make_train_step: low-res
                # logits out of the net, the loss upsamples internally.
                outputs, new_ms = model.apply(
                    cast, state.model_state, x, training=True, rng=key,
                    upsample_outputs=False,
                )
                return loss_fn(outputs, targets).astype(jnp.float32), new_ms

            (loss, new_ms), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
            grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            import optax

            new_params = optax.apply_updates(state.params, updates)
            from fastscnn_tpu.parallel.train import TrainState

            return TrainState(new_params, new_ms, new_opt, state.step + 1), loss

        # images/targets are ARGUMENTS, not closure captures: a captured
        # device array is embedded in the serialized program, whose size
        # then scales with batch — at bs≥192×480² the remote-compile relay
        # rejects the upload with HTTP 413 (round-2 finding, root-caused
        # round 3). As arguments the program size is batch-independent.
        if one_step is None:
            one_step = one_step_inline

        def body(i, carry):
            state, imgs, tgts, acc = carry
            state, loss = one_step(state, imgs, tgts, jax.random.fold_in(jax.random.PRNGKey(1), i))
            return state, imgs, tgts, acc + loss

        @jax.jit
        def bench(state, imgs, tgts):
            state, _, _, acc = lax.fori_loop(
                0, iters, body, (state, imgs, tgts, jnp.float32(0))
            )
            return state.step, acc

        try:
            step, acc = bench(state, images, targets)
            _ = np.asarray(acc)  # compile + run once
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                step, acc = bench(state, images, targets)
                _ = np.asarray(acc)
                times.append((time.perf_counter() - t0) / iters)
            dt = sorted(times)[1]
        except Exception as e:
            print(f"batch {batch} failed: {e}", file=sys.stderr)
            continue
        sps = batch / dt
        print(f"batch {batch}: {sps:.1f} samples/s ({dt * 1e3:.2f} ms/step)", file=sys.stderr)
        profile_dir = os.environ.get("BENCH_PROFILE_DIR")
        if profile_dir:
            # per-op xplane trace of the exact benched program (pass the
            # dir to fastscnn_tpu.tools.xplane with --iters <iters>)
            from fastscnn_tpu.utils.profiling import device_trace

            with device_trace(os.path.join(profile_dir, f"batch{batch}")):
                step, acc = bench(state, images, targets)
                _ = np.asarray(acc)
            print(f"profile trace → {profile_dir}/batch{batch}", file=sys.stderr)
        if sps > best_sps:
            best_sps, best_batch = sps, batch
    print(
        json.dumps(
            {
                "metric": (
                    lambda res: (
                        f"train_step_throughput_{res}_{loss_name}_aux_bf16"
                        if num_classes == 2
                        else f"train_step_throughput_{res}_{loss_name}{num_classes}_aux_bf16"
                    )
                )(
                    # 'original' chain and the native control train at the
                    # source resolution, not the crop
                    f"{src_h}x{src_w}"
                    if (device_aug_on and aug_chain == "original") or native_ctl
                    else f"{train_h}x{train_w}"
                ) + (
                    "_devaug" + ("_" + aug_chain if aug_chain != "psp" else "")
                    + ("_split" if device_aug_split else "")
                    if device_aug_on
                    else ("_native" if native_ctl else "")
                ) + ("_" + opt_name if opt_name != "sgd" else ""),
                "value": round(best_sps, 1),
                "unit": "samples/sec/chip",
                # The 232.9 samples/s reference baseline is the TuSimple
                # recipe (2-class dice 480²); other recipes have no
                # published reference speed, so no ratio is claimed.
                "vs_baseline": (
                    round(best_sps / 232.9, 2)
                    if (num_classes, loss_name, crop) == (2, "dice", 480)
                    and not size_env
                    and opt_name == "sgd"
                    and not native_ctl
                    and not (device_aug_on and aug_chain == "original")
                    else None
                ),
                "batch": best_batch,
                "stem_impl": stem_impl,
                "grad_accum": grad_accum,
            }
        )
    )


if __name__ == "__main__":
    main()
