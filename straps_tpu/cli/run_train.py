"""Training CLI.

Replaces the reference's edit-the-file workflow (`run_train.py`,
`README.md:73`) with a typed config + YAML/CLI overrides:

    python -m straps_tpu.cli.run_train --config cfg.yaml \
        batch_size=140 lr=1e-4 train_path=data/train.npz
"""

import argparse

from straps_tpu.config import TrainConfig, load_config
from straps_tpu.train import train
from straps_tpu.utils.profiling import enable_persistent_compile_cache


def main(argv=None):
    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser(description="Train the STRAPS-TPU regressor")
    parser.add_argument("--config", default=None, help="YAML config file")
    parser.add_argument("--synthetic-data", action="store_true",
                        help="generate tiny synthetic corpora (smoke runs)")
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler trace of the run into "
                             "this directory")
    parser.add_argument("overrides", nargs="*",
                        help="key=value config overrides (dotted paths)")
    args = parser.parse_args(argv)

    cfg = load_config(TrainConfig, args.config, args.overrides)
    if args.synthetic_data:
        from straps_tpu.data import write_synthetic_corpus
        cfg.train_path = write_synthetic_corpus("data/synthetic_train.npz",
                                                n=max(cfg.batch_size * 4, 64))
        cfg.val_path = write_synthetic_corpus("data/synthetic_val.npz",
                                              n=max(cfg.batch_size * 2, 32),
                                              seed=1)
    print(f"config: {cfg}")
    from straps_tpu.utils.profiling import trace
    with trace(args.profile_dir):
        state, best_params, tracker = train(cfg)
    print(f"Training completed. Best val metrics (epoch "
          f"{tracker.best_epoch}):", tracker.best_epoch_val_metrics)


if __name__ == "__main__":
    main()
