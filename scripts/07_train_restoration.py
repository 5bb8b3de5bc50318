"""Train a specialized SimpleUNet restorer per task (ref:07): MSE + Adam
(1e-3), 15 epochs, BS 32, 90/10 split, checkpoint every 5 epochs.

Unlike the reference's edit-TASK_NAME-and-rerun pattern (ref:07:13-15), the
task is a flag: --task noise|blur|fog.
"""

import functools

from _common import (PROCESSED, base_parser, ensure_clean_tree,
                     mesh_from_args,
                     restorer_ckpt_path, restorer_provenance)

from tsr_tpu import configs, zoo
from tsr_tpu.data import gtsrb
from tsr_tpu.train import common, loops


def main():
    p = base_parser(__doc__)
    p.add_argument("--task", default="noise",
                   choices=["noise", "blur", "fog", "compound"])
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--distorted-dir", default=None)
    p.add_argument("--save", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay f32)")
    p.add_argument("--host-stream", action="store_true",
                   help="stream batches from host per step instead of the "
                        "device-resident scanned-epoch loop")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--identity-frac", type=float, default=0.0,
                   help="fraction of extra clean->clean training pairs "
                        "(identity anchor). The reference trains on the "
                        "fixed-severity tree only (ref:07:122-135), which "
                        "makes the learned inverse unconditional — applied "
                        "to a mildly-distorted image (the ref:13 stress "
                        "regime) it over-corrects, e.g. the fog restorer "
                        "re-stretches contrast ~5x on a nearly-fog-free "
                        "input. Anchoring a fraction of batches at "
                        "severity zero teaches the input-conditional "
                        "inverse; 0 reproduces the reference recipe "
                        "exactly. Device-resident loop only.")
    p.add_argument("--input-minmax", action="store_true",
                   help="per-image min-max stretch in front of the UNet "
                        "(recorded in the checkpoint, applied by every "
                        "load path). Fog is a global affine map the "
                        "2-down UNet's receptive field cannot estimate; "
                        "the stretch inverts it analytically "
                        "(benchmarks/fog_ceiling.py: 43 dB vs the plain "
                        "UNet's 17). Recommended for --task fog.")
    args = p.parse_args()
    cfg = configs.RestorationTrainConfig(
        task=args.task, batch_size=args.batch_size, epochs=args.epochs,
        learning_rate=args.lr, seed=args.seed)

    clean = ensure_clean_tree(args)
    distorted = args.distorted_dir or f"{PROCESSED}/{args.task.capitalize()}"
    ckpt_config = restorer_provenance(distorted, args.identity_frac,
                                      args.input_minmax)
    save = args.save or restorer_ckpt_path(args.task, args)

    ds = gtsrb.PairedFolder(clean, distorted, size=args.image_size)
    print(f"Matched pairs: {len(ds)}")
    tr_idx, va_idx = gtsrb.train_val_split(len(ds), cfg.train_split,
                                           cfg.seed)

    import jax.numpy as jnp
    unet, variables = zoo.build_simple_unet(
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        size=args.image_size, input_minmax=args.input_minmax)
    state = common.TrainState.create(
        unet.apply, variables, common.restoration_optimizer(cfg))
    if args.resume:
        import os
        if os.path.exists(os.path.join(save, "train")):
            state = zoo.load_train_state(save, state)
            print(f"Resumed from {save} at step {int(state.step)}")

    mesh = mesh_from_args(args)
    # both trees resident: 2 trees x N x S^2 x 3 bytes, plus the identity
    # anchor's clean->clean duplicates (train_split * identity_frac of N,
    # appended to BOTH trees below)
    n_eff = len(ds) * (1.0 + args.identity_frac * cfg.train_split)
    fits = 2 * n_eff * args.image_size ** 2 * 3 < 8e9
    if args.identity_frac > 0 and not (fits and mesh is None
                                       and not args.host_stream):
        print("WARNING: --identity-frac only applies to the device-resident "
              "loop; this run streams from host (doesn't fit HBM, --mesh, "
              "or --host-stream) and trains WITHOUT the identity anchor.")
    if fits and mesh is None and not args.host_stream:
        bad, clean = ds.load_batch(range(len(ds)))
        if args.identity_frac > 0:
            # identity anchor: duplicate a slice of TRAIN clean images as
            # (clean, clean) pairs; the val split stays severe-only so the
            # val loss still measures severe-restoration quality
            import numpy as np
            rng = np.random.default_rng(cfg.seed)
            n_id = int(round(len(tr_idx) * args.identity_frac))
            pick = rng.choice(tr_idx, n_id, replace=False)
            n0 = len(bad)
            bad = np.concatenate([bad, clean[pick]])
            clean = np.concatenate([clean, clean[pick]])
            tr_idx = np.concatenate(
                [tr_idx, np.arange(n0, n0 + n_id, dtype=tr_idx.dtype)])
            print(f"Identity anchor: +{n_id} clean->clean train pairs "
                  f"({args.identity_frac:.0%})")
        loops.train_restorer_on_device(
            state, bad, clean, tr_idx, va_idx, epochs=cfg.epochs,
            batch_size=cfg.batch_size, pixel="mse", perceptual_weight=0.0,
            save_path=save, checkpoint_every=cfg.checkpoint_every,
            ckpt_config=ckpt_config, seed=cfg.seed)
    else:
        step = common.make_restoration_train_step(pixel="mse")
        evalf = common.make_restoration_eval_step(pixel="mse")
        mk = functools.partial(gtsrb.batches, ds, batch_size=cfg.batch_size,
                               workers=args.workers)
        loops.train_restorer(
            state,
            train_batches=lambda ep: mk(indices=tr_idx, seed=cfg.seed + ep),
            val_batches=lambda: mk(indices=va_idx, shuffle=False,
                                   drop_remainder=False),
            epochs=cfg.epochs, step_fn=step, eval_fn=evalf, save_path=save,
            checkpoint_every=cfg.checkpoint_every, ckpt_config=ckpt_config,
            mesh=mesh)
    print(f"Done. Checkpoint at {save}")


if __name__ == "__main__":
    main()
