"""Training CLI (parity: reference train.py:31-84).

Usage:
    python train.py --cfg configs/sup/custom/yolov5s_custom.yaml \
        [Dataset.batch_size 16 epochs 10 ...]

Selects Trainer vs SSODTrainer by cfg.SSOD.train_domain (reference
train.py:71-76). Distribution is handled inside the trainer via the device
mesh — no torch.distributed.launch equivalent is needed; all visible TPU
chips are used automatically.
"""

import argparse
import logging


def parse_opt():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True, help="config YAML")
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="dotted-path config overrides: key value ...")
    return parser.parse_args()


def main(opt):
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    # multi-host slice (v5p-16 target): one process per host; no-op for
    # single-process runs (reference train.py:52-59 DDP init, the JAX way)
    from efficientteacher_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()
    from efficientteacher_tpu.configs import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(opt.cfg)
    if opt.opts:
        cfg.merge_from_list(opt.opts)
    cfg.freeze()

    if cfg.SSOD.train_domain:
        from efficientteacher_tpu.train.ssod_trainer import SSODTrainer

        trainer = SSODTrainer(cfg)
    else:
        from efficientteacher_tpu.train.trainer import Trainer

        trainer = Trainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main(parse_opt())
