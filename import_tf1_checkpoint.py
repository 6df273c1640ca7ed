#!/usr/bin/env python
"""Convert a reference TF1 checkpoint into this framework's format.

    python import_tf1_checkpoint.py --config kpvid_tpu/configs/penn.yaml \
        --stage 1 --tf-checkpoint /path/to/model.ckpt-200000 \
        [--log-dir results/]

Writes a ckpt-<step> under {log_dir}/{detector_translator|motion_generator}/
containing generator params (+ BN stats for stage 1) and discriminator
params transcoded by name from the TF graph (see utils/tf1_import.py for
the mapping; reference models/base_model.py:77-81 for the source layout).
Optimizer state is initialized fresh. After converting both stages,
evaluate.py / make_pseudo_labels.py consume them directly.
"""

from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path


def main():
    parser = ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--stage", type=int, required=True, choices=[1, 2])
    parser.add_argument("--tf-checkpoint", type=str, required=True)
    parser.add_argument("--log-dir", type=str, default=None,
                        help="defaults to paths.log_dir from the config")
    parser.add_argument("--step", type=int, default=0,
                        help="step number for the written checkpoint")
    args = parser.parse_args()

    import jax

    from kpvid_tpu.configs import load_config
    from kpvid_tpu.utils.cache import enable_compilation_cache
    from kpvid_tpu.utils.checkpoint import save_checkpoint
    from kpvid_tpu.utils.logging import logger
    from kpvid_tpu.utils.tf1_import import transcode_tf1_checkpoint

    enable_compilation_cache()
    config = load_config(args.config)
    log_dir = args.log_dir or config.paths.log_dir
    rng = jax.random.PRNGKey(0)

    if args.stage == 1:
        from kpvid_tpu.losses import synthesize_vgg19_params
        from kpvid_tpu.train.stage1 import Stage1Trainer

        trainer = Stage1Trainer(config, synthesize_vgg19_params())
        name = "detector_translator"
    else:
        from kpvid_tpu.train.stage2 import Stage2Trainer

        trainer = Stage2Trainer(config)
        name = "motion_generator"

    state = trainer.init_state(rng)
    gen_target = {"params": state.g_params, "batch_stats": state.batch_stats}
    gen_merged, g_report = transcode_tf1_checkpoint(
        args.tf_checkpoint, gen_target, f"stage{args.stage}"
    )
    d_merged, d_report = transcode_tf1_checkpoint(
        args.tf_checkpoint, state.d_params, f"stage{args.stage}_discr"
    )
    n_g, n_d = len(g_report["matched"]), len(d_report["matched"])
    if n_g == 0:
        raise SystemExit(
            f"no generator tensors matched in {args.tf_checkpoint} - wrong "
            f"stage or config? missing={g_report['missing'][:5]}..."
        )
    for rep, tag in ((g_report, "generator"), (d_report, "discriminator")):
        for tf_name, got, want in rep["mismatched"]:
            logger.warning("%s shape mismatch %s: ckpt %s vs model %s",
                           tag, tf_name, got, want)
        if rep["missing"]:
            logger.warning("%s: %d mapped names absent from checkpoint "
                           "(first: %s)", tag, len(rep["missing"]),
                           rep["missing"][:3])
    state = state.replace(
        g_params=gen_merged["params"],
        batch_stats=gen_merged["batch_stats"],
        d_params=d_merged,
        step=jax.numpy.asarray(args.step, jax.numpy.int32),
    )
    path = save_checkpoint(log_dir, name, args.step, state,
                           keep=config.training.keep_checkpoints)
    logger.info("transcoded %d generator + %d discriminator tensors -> %s",
                n_g, n_d, path)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
