"""Train the advanced (perceptual-loss) SimpleUNet (ref:07adv): loss = L1 +
0.1*VGG-perceptual on UN-normalized inputs (reference quirk, ref:07adv:150),
Adam(2e-4). Default task: blur.

The perceptual VGG uses the trained judge's features (--judge), since
ImageNet weights are unobtainable offline (documented deviation)."""

import functools

from _common import (PROCESSED, base_parser, ensure_clean_tree,
                     mesh_from_args,
                     judge_ckpt_path, restorer_ckpt_path,
                     restorer_provenance)

from tsr_tpu import configs, zoo
from tsr_tpu.data import gtsrb
from tsr_tpu.models.vgg import PERCEPTUAL_TAP
from tsr_tpu.train import common, loops


def main():
    p = base_parser(__doc__)
    p.add_argument("--task", default="blur")
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--perceptual-weight", type=float, default=0.1)
    p.add_argument("--judge", default=None,
                   help="judge checkpoint for perceptual features; "
                        "'none' disables the perceptual term")
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--distorted-dir", default=None)
    p.add_argument("--save", default=None)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay f32)")
    p.add_argument("--host-stream", action="store_true",
                   help="stream batches from host per step instead of the "
                        "device-resident scanned-epoch loop")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--identity-frac", type=float, default=0.0,
                   help="fraction of extra clean->clean training pairs "
                        "(identity anchor; see scripts/07). 0 reproduces "
                        "the reference recipe exactly.")
    p.add_argument("--input-minmax", action="store_true",
                   help="per-image min-max stretch in front of the UNet "
                        "(see scripts/07; recommended for --task fog)")
    args = p.parse_args()
    if args.judge is None:
        args.judge = judge_ckpt_path(args)
    cfg = configs.AdvancedTrainConfig(
        task=args.task, batch_size=args.batch_size, epochs=args.epochs,
        learning_rate=args.lr, perceptual_weight=args.perceptual_weight,
        seed=args.seed)

    clean = ensure_clean_tree(args)
    distorted = args.distorted_dir or f"{PROCESSED}/{args.task.capitalize()}"
    save = args.save or restorer_ckpt_path(args.task, args)

    ds = gtsrb.PairedFolder(clean, distorted, size=args.image_size)
    print(f"Matched pairs: {len(ds)}")
    tr_idx, va_idx = gtsrb.train_val_split(len(ds), cfg.train_split,
                                           cfg.seed)

    vgg_apply = None
    if args.judge != "none":
        ncls = args.num_classes or len(gtsrb.ImageFolder(clean).classes)
        import jax.numpy as _jnp
        judge, jvars = zoo.load_model(
            "vgg16", args.judge, args.image_size, num_classes=ncls,
            dtype=_jnp.bfloat16 if args.bf16 else _jnp.float32)

        def vgg_apply(x01):  # frozen features[:16], un-normalized input
            return judge.apply(jvars, x01, train=False,
                               tap_layer=judge.tap_index(PERCEPTUAL_TAP))

    import jax.numpy as jnp
    unet, variables = zoo.build_simple_unet(
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        size=args.image_size, input_minmax=args.input_minmax)
    state = common.TrainState.create(
        unet.apply, variables, common.advanced_optimizer(cfg))
    ckpt_config = restorer_provenance(distorted, args.identity_frac,
                                      args.input_minmax)

    mesh = mesh_from_args(args)
    # resident size includes the identity anchor's duplicates (see 07)
    n_eff = len(ds) * (1.0 + args.identity_frac * cfg.train_split)
    fits = 2 * n_eff * args.image_size ** 2 * 3 < 8e9
    if args.identity_frac > 0 and not (fits and mesh is None
                                       and not args.host_stream):
        print("WARNING: --identity-frac only applies to the device-resident "
              "loop; this run streams from host (doesn't fit HBM, --mesh, "
              "or --host-stream) and trains WITHOUT the identity anchor.")
    if fits and mesh is None and not args.host_stream:
        bad, clean_arr = ds.load_batch(range(len(ds)))
        if args.identity_frac > 0:
            import numpy as np
            rng = np.random.default_rng(cfg.seed)
            n_id = int(round(len(tr_idx) * args.identity_frac))
            pick = rng.choice(tr_idx, n_id, replace=False)
            n0 = len(bad)
            bad = np.concatenate([bad, clean_arr[pick]])
            clean_arr = np.concatenate([clean_arr, clean_arr[pick]])
            tr_idx = np.concatenate(
                [tr_idx, np.arange(n0, n0 + n_id, dtype=tr_idx.dtype)])
            print(f"Identity anchor: +{n_id} clean->clean train pairs "
                  f"({args.identity_frac:.0%})")
        loops.train_restorer_on_device(
            state, bad, clean_arr, tr_idx, va_idx, epochs=cfg.epochs,
            batch_size=cfg.batch_size, pixel="l1",
            perceptual_weight=cfg.perceptual_weight, vgg_apply=vgg_apply,
            save_path=save, ckpt_config=ckpt_config, seed=cfg.seed)
    else:
        step = common.make_restoration_train_step(
            pixel="l1", perceptual_weight=cfg.perceptual_weight,
            vgg_apply=vgg_apply)
        evalf = common.make_restoration_eval_step(
            pixel="l1", perceptual_weight=cfg.perceptual_weight,
            vgg_apply=vgg_apply)
        mk = functools.partial(gtsrb.batches, ds, batch_size=cfg.batch_size,
                               workers=args.workers)
        loops.train_restorer(
            state,
            train_batches=lambda ep: mk(indices=tr_idx, seed=cfg.seed + ep),
            val_batches=lambda: mk(indices=va_idx, shuffle=False,
                                   drop_remainder=False),
            epochs=cfg.epochs, step_fn=step, eval_fn=evalf, save_path=save,
            ckpt_config=ckpt_config, mesh=mesh)
    print(f"Done. Checkpoint at {save}")


if __name__ == "__main__":
    main()
