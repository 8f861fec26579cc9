"""Command-line option registry.

Parity reference: ``M4DepthOptions`` (m4depth_options.py:8-102) — same flag
names so the reference's shell scripts port 1:1 — plus TPU-specific knobs
(compute dtype, mesh shape, validation mode).
"""

from __future__ import annotations

import argparse
import os

from m4depth_tpu.config import (
    AblationFlags,
    ModelConfig,
    TrainConfig,
    load_dataset_locations,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_parser(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    g = parser
    g.add_argument("--dataset", default="",
                   choices=["midair", "tartanair", "kitti-raw"],
                   help="Dataset to use")
    g.add_argument("--platform", default="",
                   choices=["", "cpu", "tpu"],
                   help="Force the JAX platform before backend init "
                        "(JAX_PLATFORMS is not honored on this rig; CPU "
                        "validation children next to a TPU trainer need "
                        "--platform=cpu)")
    g.add_argument("--ckpt_dir", default="ckpt",
                   help="Model checkpoint directory")
    g.add_argument("--mode",
                   choices=["train", "finetune", "eval", "validation",
                            "predict", "convert", "promote"],
                   help="Run mode (convert: decode the CSV dataset once "
                        "into a binary record store, the legacy TFRecord-DB "
                        "capability, protobuf_db.py:287-358; promote: "
                        "re-save ckpt_dir/best's ledger winner under "
                        "promote_dest/train so finetuning resumes from it, "
                        "the reference's best->train move, "
                        "scripts/1b-finetune-kitti.sh:5-11)")
    g.add_argument("--promote_dest", default=None, type=str,
                   help="promote mode: destination checkpoint dir "
                        "(defaults to --ckpt_dir, promoting in place)")
    g.add_argument("--record_store", default=None, type=str,
                   help="Path to a record store. With --mode=convert: the "
                        "output directory. Other modes: train/eval from the "
                        "store (mmap windows) instead of decoding "
                        "JPEG/PNG per epoch")
    g.add_argument("--db_path_config",
                   default=os.path.join(REPO_ROOT, "datasets_location.json"),
                   help="Json file with datasets path configuration")
    g.add_argument("--batch_size", default=3, type=int)
    g.add_argument("--records_path", default=None, type=str,
                   help="csv manifests to use when loading the dataset")
    g.add_argument("--db_seq_len", default=None, type=int,
                   help="Dataset sequence length (mandatory for training)")
    g.add_argument("--seq_len", default=4, type=int,
                   help="Sequence length fed to the network")
    g.add_argument("--log_dir", default=None)
    g.add_argument("--summary_interval", default=1200, type=int)
    g.add_argument("--save_interval", default=2, type=int)
    g.add_argument("--no_augmentation", default=False, action="store_true")
    g.add_argument("--augment_device", default=False, action="store_true",
                   help="run augmentation on-device inside the jitted train "
                        "step (data/augment_device.py) instead of host "
                        "numpy; removes the host augment bottleneck "
                        "(DEVELOPMENT.md io_bench)")
    # accepted for 1:1 reference-script compatibility; both are vestigial
    # there too (conf_err_rate is declared but never consumed,
    # m4depth_options.py:51; disable_xla toggles a TF env flag with no JAX
    # equivalent — everything here is jit-compiled)
    g.add_argument("--conf_err_rate", default=0.05, type=float,
                   help=argparse.SUPPRESS)
    g.add_argument("--disable_xla", default=False, action="store_true",
                   help=argparse.SUPPRESS)
    g.add_argument("--enable_validation", default=False, action="store_true")
    g.add_argument("--keep_top_n", default=1, type=int)
    # Ablations
    g.add_argument("--arch_depth", default=6, type=int)
    g.add_argument("--no_DINL", default=False, action="store_true")
    g.add_argument("--no_SNCV", default=False, action="store_true")
    g.add_argument("--no_time_recurr", default=False, action="store_true")
    g.add_argument("--no_feature_normalization", default=False,
                   action="store_true")
    g.add_argument("--no_feature_subdivision", default=False,
                   action="store_true")
    g.add_argument("--no_level_memory", default=False, action="store_true")
    # TPU-native extras
    g.add_argument("--model", default="m4depth",
                   choices=["m4depth", "m4depth-v1"],
                   help="Model family: Sensors-2022 parallax-recurrent "
                        "(default) or the legacy arXiv-2021 depth-recurrent "
                        "architecture")
    g.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    g.add_argument("--cv_dtype", default="bfloat16",
                   choices=["float32", "bfloat16", "float16"],
                   help="Cost-volume correlation dtype (the reference "
                        "hardcoded fp16, depth_operations.py:276-278)")
    g.add_argument("--dscv_impl", default="rows",
                   choices=["split", "rows", "rows_fused", "fused", "flat",
                            "expanded", "gather"],
                   help="DSCV formulation: dy-row fetches off a slim "
                        "operand (rows, TPU-fast default), the same with a "
                        "Pallas fused post-gather reduce (rows_fused, "
                        "forward-only), chunked expanded static shifts "
                        "(split), split + Pallas fused reduce (fused, "
                        "forward-only serving path), single-fetch expanded "
                        "variants, or direct per-hypothesis warp")
    g.add_argument("--dscv_row_group", type=int, default=2,
                   help="rows impl: y-shifts packed per fetched row (must "
                        "divide 2*search_range+2; measured optimum 2)")
    g.add_argument("--dscv_x_window", type=int, default=5,
                   help="rows impl: direction-narrowed fetch box width "
                        "(octant lever; 0 = full-width fetch). Exact for "
                        "all motions with --dscv_xw_dual at >= "
                        "row_group+3; ignored when >= 2*search_range+2")
    g.add_argument("--dscv_xw_dual", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="rows impl: dual-operand narrow fetch — also build "
                        "the transposed operand and select per pixel, "
                        "making --dscv_x_window exact for ALL motions "
                        "(default on; measured 209-214 fps / 176 ms train "
                        "step vs 203/221 full-width)")
    g.add_argument("--dscv_chunk_bytes", type=int, default=30 << 20,
                   help="split impl: target bytes per gather chunk "
                        "(per-geometry table in DEVELOPMENT.md)")
    g.add_argument("--remat_policy", default="dscv",
                   choices=["dscv", "all"],
                   help="With --remat: checkpoint only the DSCV (recompute "
                        "its multi-GB expansion/gather temps in the "
                        "backward) or the whole decoder level")
    g.add_argument("--dscv_bwd", default="xla",
                   choices=["xla", "corner", "pallas"],
                   help="Split-DSCV backward strategy (training hot spot; "
                        "measured trade-offs in DEVELOPMENT.md 'the scatter "
                        "is conserved')")
    g.add_argument("--sncv_impl", default="xla", choices=["xla", "pallas"],
                   help="SNCV kernel: XLA static slices or fused Pallas")
    g.add_argument("--time_axis", default="auto",
                   choices=["auto", "unroll", "scan"],
                   help="Frame-loop lowering: auto unrolls T <= 5 and scans "
                        "longer windows (measured matrix in DEVELOPMENT.md "
                        "'Time-axis scan')")
    g.add_argument("--scan_unroll", default=2, type=int,
                   help="lax.scan body replication on the scan path: "
                        "recovers cross-frame fusion within groups (2 "
                        "closes the scan/unroll gap to ~1.1-1.2x)")
    g.add_argument("--remat", default=False, action="store_true",
                   help="Rematerialize decoder levels in the backward pass "
                        "(trades FLOPs for HBM)")
    g.add_argument("--grad_clip_norm", default=0.0, type=float,
                   help="Global-norm gradient clip; 0 disables. The "
                        "reference had none and documents NaN crashes "
                        "(README.md:153)")
    g.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "staircase", "cosine"],
                   help="constant (main.py:92), the legacy halving at "
                        "60k/120k/180k/240k/300k steps, or warmup-cosine "
                        "decay over total_steps (VALIDATION.md recipe)")
    g.add_argument("--seed", default=42, type=int,
                   help="Init/shuffle seed (main.py:76 uses 42)")
    g.add_argument("--data_mesh", default=-1, type=int,
                   help="Devices on the data-parallel mesh axis (-1 = all)")
    g.add_argument("--num_workers", default=8, type=int)
    g.add_argument("--learning_rate", default=1e-4, type=float)
    g.add_argument("--total_steps", default=220000, type=int)
    g.add_argument("--finetune_steps", default=20000, type=int)
    g.add_argument("--output_dir", default=None, type=str,
                   help="predict mode: write 16-bit depth PNGs here "
                        "(depth * 256, KITTI convention)")
    g.add_argument("--out_size", default=None, type=int, nargs=2,
                   metavar=("H", "W"),
                   help="Override the dataset's output size")
    g.add_argument("--validation_mode", default="sync",
                   choices=["sync", "subprocess"],
                   help="Run per-epoch validation inline (sync) or as a "
                        "background process (the reference's scheme, "
                        "callbacks.py:142-170)")
    g.add_argument("--validation_device", default="cpu",
                   choices=["cpu", "tpu"],
                   help="Platform for the validation subprocess (forwarded "
                        "as its --platform; must be a value --platform "
                        "accepts or the child dies at argparse and per-"
                        "epoch validation is silently lost)")
    g.add_argument("--validation_max_batches", default=0, type=int,
                   help="Bound the validation subset size (0 = full set); "
                        "keeps a CPU-pinned validation child within an "
                        "epoch at real scale")
    return parser


def ablation_from_args(cmd) -> AblationFlags:
    return AblationFlags(
        dinl=not cmd.no_DINL,
        sncv=not cmd.no_SNCV,
        time_recurr=not cmd.no_time_recurr,
        normalize_features=not cmd.no_feature_normalization,
        subdivide_features=not cmd.no_feature_subdivision,
        level_memory=not cmd.no_level_memory,
    )


def model_config_from_args(cmd, depth_type: str = "map") -> ModelConfig:
    return ModelConfig(
        num_levels=cmd.arch_depth,
        ablation=ablation_from_args(cmd),
        depth_type=depth_type,
        compute_dtype=cmd.compute_dtype,
        cv_dtype=getattr(cmd, "cv_dtype", "bfloat16"),
        dscv_impl=getattr(cmd, "dscv_impl", "rows"),
        dscv_row_group=getattr(cmd, "dscv_row_group", 2),
        dscv_x_window=getattr(cmd, "dscv_x_window", 5),
        dscv_xw_dual=getattr(cmd, "dscv_xw_dual", True),
        dscv_chunk_bytes=getattr(cmd, "dscv_chunk_bytes", 30 << 20),
        dscv_bwd=getattr(cmd, "dscv_bwd", "xla"),
        sncv_impl=getattr(cmd, "sncv_impl", "xla"),
        time_axis=getattr(cmd, "time_axis", "auto"),
        scan_unroll=getattr(cmd, "scan_unroll", 2),
        remat=getattr(cmd, "remat", False),
        remat_policy=getattr(cmd, "remat_policy", "dscv"),
    )


def train_config_from_args(cmd) -> TrainConfig:
    return TrainConfig(
        learning_rate=cmd.learning_rate,
        lr_schedule=getattr(cmd, "lr_schedule", "constant"),
        grad_clip_norm=getattr(cmd, "grad_clip_norm", 0.0),
        seed=getattr(cmd, "seed", 42),
        total_steps=cmd.total_steps,
        finetune_steps=cmd.finetune_steps,
        ckpt_dir=cmd.ckpt_dir,
        log_dir=cmd.log_dir,
        keep_top_n=cmd.keep_top_n,
        summary_interval=cmd.summary_interval,
        enable_validation=cmd.enable_validation,
        mesh_shape=(cmd.data_mesh,),
        mesh_axes=("data",),
    )


def dataset_locations(cmd) -> dict:
    if os.path.isfile(cmd.db_path_config):
        return load_dataset_locations(cmd.db_path_config)
    return {}


def finetune_total_steps(ckpt_dir: str, finetune_steps: int,
                         epoch_len: int) -> int:
    """Total optimizer steps for a (possibly resumed) finetune run.

    Reference semantics: resume + steps//len + 1 epochs
    (finetune-kitti.py:85) — the +1 guarantees at least one finetune epoch
    even when finetune_steps < one epoch; without it a resumed run with
    finetune_steps < epoch_len floors to zero new epochs and silently
    trains nothing. Shared by cli/main.py finetune mode and
    cli/finetune_kitti.py so the resume accounting can't diverge.
    """
    from m4depth_tpu.train.checkpoints import TrainCheckpointManager

    mgr = TrainCheckpointManager(os.path.join(ckpt_dir, "train"))
    resume = mgr.resume_epoch
    mgr.close()
    return (resume + finetune_steps // epoch_len + 1) * epoch_len
