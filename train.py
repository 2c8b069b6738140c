"""Training CLI: `python train.py --cfg configs/config_stage2.yaml
[--pretrained <ckpt>]` — same surface as the reference
(/root/reference/train.py), TPU-native underneath: one jitted train step over
a ('dp','tp') jax.sharding mesh, host-sharded input pipeline, orbax
checkpoints.

Multi-host: launch one process per host with jax.distributed (Slurm or
tpu-env auto-detection); rank-0 does the logging/checkpointing.
"""

import os
import sys

import jax
import numpy as np

from maed_tpu.utils.platform import honor_env_platform

honor_env_platform()

from maed_tpu.core.config import parse_args
from maed_tpu.core.loss import LossWeights
from maed_tpu.core.trainer import Trainer
from maed_tpu.data.loaders import get_data_loaders
from maed_tpu.models import MAED
from maed_tpu.parallel.mesh import make_mesh, param_shardings
from maed_tpu.parallel.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from maed_tpu.utils.checkpoint import load_checkpoint, load_pretrained_params
from maed_tpu.utils.logging_utils import create_logger, prepare_output_dir
from maed_tpu.utils.smpl_io import find_smpl_model


def maybe_init_distributed():
    """Multi-host init from Slurm or TPU pod env; no-op single-process."""
    if os.environ.get("SLURM_NPROCS") and int(os.environ["SLURM_NPROCS"]) > 1:
        jax.distributed.initialize()
    elif os.environ.get("MAED_MULTIHOST"):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def main():
    args, cfg, cfg_file = parse_args()
    rank, world = maybe_init_distributed()

    logdir = ""
    logger = None
    writer = None
    if rank == 0:
        logdir = prepare_output_dir(cfg.OUTPUT_DIR, cfg.EXP_NAME, cfg.dump())
        logger = create_logger(logdir)
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(logdir)
        except ImportError:
            writer = None
        logger.info(f"devices: {jax.devices()}, process {rank}/{world}")

    if cfg.SEED_VALUE >= 0:
        np.random.seed(cfg.SEED_VALUE)

    enc = cfg.MODEL.ENCODER
    dec = cfg.MODEL.DECODER
    model = MAED(
        encoder=enc.BACKBONE, num_blocks=enc.NUM_BLOCKS, num_heads=enc.NUM_HEADS,
        st_mode=enc.SPA_TEMP_MODE, decoder=dec.BACKBONE, hidden_dim=dec.HIDDEN_DIM,
    )
    smpl = find_smpl_model()

    loaders = get_data_loaders(cfg, rank=rank, world_size=world, verbose=rank == 0)

    steps_per_epoch = (
        cfg.TRAIN.NUM_ITERS_PER_EPOCH
        if cfg.TRAIN.NUM_ITERS_PER_EPOCH > 0
        else max(len(l) for k, l in loaders.items() if k.startswith("train"))
    )
    tx = make_optimizer(cfg.TRAIN.OPTIM, steps_per_epoch)

    d = cfg.DATASET
    n_vid = cfg.TRAIN.BATCH_SIZE_2D + cfg.TRAIN.BATCH_SIZE_3D
    sample = np.zeros((max(n_vid, 1), d.SEQLEN, d.HEIGHT, d.WIDTH, 3), np.float32)
    state = init_train_state(model, tx, sample, smpl, jax.random.PRNGKey(max(cfg.SEED_VALUE, 0)))

    if getattr(args, "init_backbone", ""):
        from maed_tpu.utils.pretrained import apply_pretrained_backbone

        state = state._replace(
            params=apply_pretrained_backbone(state.params, args.init_backbone)
        )
        if logger:
            logger.info(f"=> loaded published backbone init from {args.init_backbone}")

    if args.pretrained:
        ckpt = load_checkpoint(args.pretrained)
        state = state._replace(
            params=load_pretrained_params(state.params, ckpt["params"], drop_decoder=True)
        )
        if logger:
            logger.info(f"=> loaded pretrained encoder from {args.pretrained}")

    # mesh geometry from env (defaults: pure dp over every device).
    # MAED_MESH_TP shards ViT qkv/proj/MLP Megatron-style; MAED_MESH_DCN adds
    # outer data parallelism across slice boundaries (multi-slice pods).
    mesh = make_mesh(tp=int(os.environ.get("MAED_MESH_TP", "1")),
                     dcn=int(os.environ.get("MAED_MESH_DCN", "1")))
    from maed_tpu.ops.pallas_gate import register_mesh

    register_mesh(mesh)  # pallas kernels stand down on >1-device meshes
    shardings = param_shardings(state.params, mesh)
    state = state._replace(params=jax.tree.map(jax.device_put, state.params, shardings))

    weights = LossWeights(
        kp_2d=cfg.LOSS.KP_2D_W, kp_3d=cfg.LOSS.KP_3D_W, shape=cfg.LOSS.SHAPE_W,
        pose=cfg.LOSS.POSE_W, norm=cfg.LOSS.SMPL_NORM, accl=cfg.LOSS.ACCL_W,
    )
    train_step = make_train_step(
        model, tx, smpl, weights, has_batch_stats=enc.BACKBONE.lower() == "cnn",
    )

    def eval_fwd(variables, images, J_regressor=None):
        from maed_tpu.ops.image import apply_device_preproc

        # params arrive as jit ARGUMENTS (the Trainer passes the live state
        # per validation), so one compiled executable serves every epoch.
        # images: f32 crops, uint8 crops (DEVICE_PREPROC), or a raw-frames+
        # affines pack (DEVICE_CROP) — resolved in-jit
        images = apply_device_preproc(images, d.HEIGHT, d.WIDTH)
        return model.apply(variables, images, smpl, J_regressor=J_regressor)

    trainer = Trainer(
        data_loaders=loaders,
        train_step=train_step,
        state=state,
        model=model,
        smpl_model=smpl,
        cfg=cfg,
        logdir=logdir,
        eval_fwd=eval_fwd,
        writer=writer,
        logger=logger,
        rank=rank,
        num_iters_per_epoch=cfg.TRAIN.NUM_ITERS_PER_EPOCH,
        mesh=mesh,
        allow_missing_regressor=args.allow_synthetic_smpl,
    )
    trainer.fit()
    if trainer.preempted:
        if rank == 0:
            # graceful preemption stop: the exact mid-epoch state is on
            # disk; a supervisor relaunch with TRAIN.RESUME=<logdir>/preempt
            # (or TRAIN.RESUME=auto) continues bit-exactly from here
            (logger.info if logger else print)(
                f"preempted — resume with TRAIN.RESUME={logdir}/preempt"
            )
        # default exit 0 (pod managers treat nonzero as failure); a relaunch
        # loop that must tell "preempted" from "finished" sets
        # MAED_PREEMPT_EXIT to a distinct code (scripts/train_supervised.sh)
        sys.exit(int(os.environ.get("MAED_PREEMPT_EXIT", "0")))


if __name__ == "__main__":
    main()
