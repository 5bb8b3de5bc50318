"""Fine-tune the VGG16 judge on the clean tree (ref:05): SGD(1e-3, 0.9),
CE loss, 10 epochs, BS 64, 80/20 split, best-val-acc checkpoint.

Deviation: ImageNet pretrained weights are unobtainable offline, so the
judge trains from scratch; pass --batchnorm (vgg16_bn variant) for a
trainable-from-scratch configuration, or --init-pth to start from a
torchvision-format .pth if you have one.
"""

import functools


from _common import (base_parser, ensure_clean_tree, judge_ckpt_path,
                     mesh_from_args)

from tsr_tpu import checkpoint as ckpt
from tsr_tpu import configs, zoo
from tsr_tpu.data import gtsrb
from tsr_tpu.train import common, loops


def main():
    p = base_parser(__doc__)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--optimizer", choices=("sgd", "adamw"), default="sgd",
                   help="sgd = reference recipe (ref:05:60, assumes "
                        "ImageNet init); adamw = from-scratch alternative")
    p.add_argument("--batchnorm", action="store_true")
    p.add_argument("--label-smoothing", type=float, default=0.0,
                   help="CE label smoothing. A from-scratch judge that "
                        "memorizes a small corpus is near-deterministically "
                        "overconfident (max softmax ~1.0 everywhere); the "
                        "reference's ImageNet-initialized judge is not "
                        "(ref:13 reports mean clean confidence 0.981, mild-"
                        "distorted 0.749). Smoothing restores a realistic "
                        "confidence scale; argmax metrics are unaffected "
                        "in expectation.")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay f32) — ~4x conv "
                        "throughput on the v5e MXU")
    p.add_argument("--host-stream", action="store_true",
                   help="stream batches from host per step instead of the "
                        "device-resident scanned-epoch loop (automatic for "
                        "datasets too big for HBM or when --mesh is set)")
    p.add_argument("--init-pth", default=None,
                   help="torchvision-format VGG16 .pth to start from")
    p.add_argument("--save", default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from --save (params+opt state+step)")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()
    args.save = args.save or judge_ckpt_path(args)
    cfg = configs.JudgeTrainConfig(
        batch_size=args.batch_size, epochs=args.epochs,
        learning_rate=args.lr, optimizer=args.optimizer, seed=args.seed,
        label_smoothing=args.label_smoothing)

    root = ensure_clean_tree(args)
    ds = gtsrb.ImageFolder(root, size=args.image_size)
    print(f"Training set: {len(ds)} images, {len(ds.classes)} classes")
    tr_idx, va_idx = gtsrb.train_val_split(len(ds), cfg.train_split,
                                           cfg.seed)

    import jax.numpy as jnp
    judge, variables = zoo.build_judge(
        num_classes=len(ds.classes), use_batchnorm=args.batchnorm,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        size=args.image_size)
    if args.init_pth:
        variables = ckpt.vgg16_from_pth(ckpt.load_pth(args.init_pth),
                                        num_classes=len(ds.classes))
    state = common.TrainState.create(
        judge.apply, variables, common.judge_optimizer(cfg))
    if args.resume:
        import os
        if os.path.exists(os.path.join(args.save, "train")):
            state = zoo.load_train_state(args.save, state)
            print(f"Resumed from {args.save} at step {int(state.step)}")

    ckpt_config = {"kind": "vgg16", "num_classes": len(ds.classes),
                   "use_batchnorm": args.batchnorm}
    mesh = mesh_from_args(args)
    # device-resident when the uint8 tree fits comfortably in HBM
    fits = len(ds) * args.image_size ** 2 * 3 < 8e9
    if fits and mesh is None and not args.host_stream:
        images, labels = ds.load_batch(range(len(ds)))
        loops.train_judge_on_device(
            state, images, labels, tr_idx, va_idx, cfg,
            save_path=args.save, ckpt_config=ckpt_config)
    else:
        mk = functools.partial(gtsrb.batches, ds, batch_size=cfg.batch_size,
                               workers=args.workers)
        loops.train_judge(
            state,
            train_batches=lambda ep: mk(indices=tr_idx, seed=cfg.seed + ep),
            val_batches=lambda: mk(indices=va_idx, shuffle=False,
                                   drop_remainder=False),
            cfg=cfg, save_path=args.save,
            ckpt_config=ckpt_config,
            mesh=mesh)
    print(f"Done. Checkpoint at {args.save}")


if __name__ == "__main__":
    main()
