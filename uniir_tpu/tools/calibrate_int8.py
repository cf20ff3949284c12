"""Offline static-int8 activation calibration CLI.

Produces the calibration artifact that `UNIIR_INT8_BACKEND=static` serving
consumes: per-projection activation amax scales (MLP pairs, attention
qkv/out pairs, MED's per-dense sow probes, T5's per-block FFN pairs),
measured by running the BF16 model over real M-BEIR probe batches
(TensorRT-style post-training calibration; the reference has no int8 serving
path at all -- fp16 autocast only, src/common/mbeir_embedder.py:49-56).
Works for all four model variants.

    python -m uniir_tpu.tools.calibrate_int8 \
        --config_path configs/clip_sf/large/eval/inbatch/embed.yaml \
        --uniir_dir /data/UniIR --mbeir_data_dir /data/UniIR/mbeir_data \
        --out calib_clip_sf_large.npz --num_batches 8

Then serve with `model.int8: true`, `model.int8_calibration:
calib_clip_sf_large.npz` and `UNIIR_INT8_BACKEND=static`
(models/registry.py loads the artifact into `quantize_tree`).

Probe data: the first enabled split/dataset of the embed config's sweep --
query batches exercise BOTH towers, so one pass calibrates every MLP.  The
probe runs the plain bf16 model (int8 forced off) with flax
`capture_intermediates`; see ops/calibrate.py for the measurement itself.
"""

from __future__ import annotations

import argparse
import itertools
import os

from uniir_tpu.core.config import load_config, parse_image_size
from uniir_tpu.data.collator import MBEIRMainCollator
from uniir_tpu.data.dataset import MBEIRMainDataset, Mode
from uniir_tpu.data.loader import ContiguousSampler, MBEIRLoader
from uniir_tpu.models.registry import build_model_from_config
from uniir_tpu.ops.calibrate import calibrate_act_scales, save_act_scales
from uniir_tpu.train.steps import _model_inputs


def parse_arguments():
    parser = argparse.ArgumentParser(description="uniir_tpu static-int8 calibration")
    parser.add_argument("--uniir_dir", type=str, default="/data/UniIR")
    parser.add_argument("--mbeir_data_dir", type=str, default="/data/UniIR/mbeir_data")
    parser.add_argument("--config_path", default="config.yaml", help="embed.yaml-style config")
    parser.add_argument("--out", required=True, help="output .npz calibration artifact")
    parser.add_argument("--num_batches", type=int, default=8, help="probe batches to observe")
    parser.add_argument("--batch_size", type=int, default=0, help="0 = config's dataloader batch size")
    parser.add_argument("--margin", type=float, default=1.1, help="amax clip headroom multiplier")
    return parser.parse_args()


def first_probe_loader(bundle, config, batch_size: int):
    """Query loader for the first enabled split/dataset of the embed sweep."""
    data_config = config.data_config
    embed_config = config.embed_config
    for split_name in ("test", "val", "train"):
        ds_cfg = getattr(embed_config, f"{split_name}_datasets_config", None)
        if not (ds_cfg and ds_cfg.enable_embed):
            continue
        split_dir = getattr(data_config, f"{split_name}_dir_name")
        dataset_name = ds_cfg.datasets_name[0].lower()
        cand_pool_name = ds_cfg.correspond_cand_pools_name[0].lower()
        dataset = MBEIRMainDataset(
            mbeir_data_dir=config.mbeir_data_dir,
            query_data_path=os.path.join(split_dir, f"mbeir_{dataset_name}_{split_name}.jsonl"),
            cand_pool_path=os.path.join(
                data_config.cand_pool_dir_name, f"mbeir_{cand_pool_name}_cand_pool.jsonl"
            ),
            query_instruct_path=data_config.query_instruct_path,
            img_preprocess_fn=bundle.img_preprocess_fn_eval,
            mode=Mode.EVAL,
            enable_query_instruct=data_config.enable_query_instruct,
            shuffle_cand=data_config.shuffle_cand,
        )
        collator = MBEIRMainCollator(
            tokenizer=bundle.tokenizer,
            image_size=parse_image_size(data_config.image_size),
            mode=Mode.EVAL,
        )
        return MBEIRLoader(
            dataset,
            collator,
            batch_size=batch_size,
            sampler=ContiguousSampler(len(dataset), num_replicas=1, rank=0),
            num_workers=config.dataloader_config.num_workers,
            drop_last=False,
            pad_last=True,
        )
    raise ValueError("no enabled split in embed config to probe from")


def main():
    args = parse_arguments()
    config = load_config(args.config_path)
    config.uniir_dir = args.uniir_dir
    config.mbeir_data_dir = args.mbeir_data_dir
    # probe in bf16: calibration observes the FLOAT model's activations
    if getattr(config.model, "int8", False):
        config.model.int8 = False
    # per-variant MLP activation: CLIP towers use quick_gelu, BLIP's ViT the
    # exact erf gelu (MED is post-LN and not captured; T5's relu FFN falls
    # back to per-matmul static scales, models/layers.py)
    act = {
        "CLIPScoreFusion": "quick_gelu",
        "CLIPFeatureFusion": "quick_gelu",
        "BLIPScoreFusion": "gelu",
        "BLIPFeatureFusion": "gelu",
    }[config.model.name]

    bundle = build_model_from_config(config)
    batch_size = args.batch_size or config.dataloader_config.batch_size
    loader = first_probe_loader(bundle, config, batch_size)

    batches = []
    for batch in itertools.islice(iter(loader), args.num_batches):
        for key in ("n_valid", "did_list", "qid_list", "task_id_list", "index_mapping"):
            batch.pop(key, None)
        batches.append(_model_inputs(batch))
    assert batches, "probe loader yielded no batches"

    scales = calibrate_act_scales(
        bundle.model, bundle.params, batches, act=act, margin=args.margin
    )
    save_act_scales(args.out, scales)
    print(f"Calibrated {len(scales)} act-scale pairs over {len(batches)} batches -> {args.out}")


if __name__ == "__main__":
    main()
