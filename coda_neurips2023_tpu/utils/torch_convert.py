"""Reference PyTorch checkpoint -> CoDA-TPU flax variables.

Maps the reference detector's state dict
(Model3DETRPredictedBoxDistillationHead / Model3DETRMultiClassHead,
/root/reference/models/model_3detr.py) onto the CoDA3DETR flax tree, enabling
eval-parity testing with the released .pth checkpoints (SURVEY.md section 4,
anchor (e)).

Name contracts (reference -> here):
  pre_encoder.mlp_module.layer{i}.conv.weight (O,I,1,1)   -> pre_encoder/mlp_module/conv{i}/kernel (I,O)
  pre_encoder.mlp_module.layer{i}.bn.bn.{weight,bias,running_mean,running_var}
        -> params bn{i}/{scale,bias} + batch_stats bn{i}/{mean,var}
  encoder.layers.{i}.{self_attn,linear1,linear2,norm1,norm2}
        -> encoder/layer{i}/... (torch MultiheadAttention in_proj split into
           flax query/key/value DenseGeneral kernels)
  decoder.layers.{i}.{self_attn,multihead_attn,linear1,linear2,norm1..3}
        + decoder.norm -> decoder/layer{i}/..., decoder/norm
  encoder_to_decoder_projection.layers.{0,3,6}.weight (+ BN at 1,4,7)
        -> encoder_to_decoder_projection/{layer0,layer1,out} + norms
  query_projection.layers.{0,2}   -> query_projection/{layer0,out}
  mlp_heads.{name}.layers.{0,4,8} (+ BN at 1,5)
        -> {name}/{layer0,norm0,layer1,norm1,out}
  pos_embedding.gauss_B           -> constants pos_embedding/gauss_B
  logit_scale                     -> returned separately (exp-clipped at use)
  clip_model.* / test_clip_model.* are the frozen CLIP towers; extract with
  models.clip.convert_openai_checkpoint-compatible helpers if needed.

Conventions: torch Linear/1x1-Conv weights are (out, in[, 1, 1]) and flax
kernels are (in, out) -- transposed + squeezed here.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from coda_neurips2023_tpu.models.clip import _mha_params, _reshape_mha_for_flax


def _conv_kernel(w):  # (O, I, 1[, 1]) -> (I, O)
    w = np.asarray(w)
    while w.ndim > 2:
        w = w[..., 0]
    return w.T


def _linear(sd, prefix):
    out = {"kernel": np.asarray(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]), "bias": np.asarray(sd[prefix + ".bias"])}


def _bn(sd, prefix):
    params = _ln(sd, prefix)
    stats = {
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }
    return params, stats


def _mha(sd, prefix, nhead):
    return _reshape_mha_for_flax(
        _mha_params({k: np.asarray(v) for k, v in sd.items() if k.startswith(prefix)}, prefix),
        nhead,
    )


def _generic_mlp(sd, prefix, hidden_norm: bool, n_hidden: int, out_norm: bool,
                 dropout: bool):
    """Reference GenericMLP Sequential indices -> our named tree."""
    params, stats = {}, {}
    stride = 3 + (1 if dropout else 0)  # conv, [bn], act, [dropout]
    if not hidden_norm:
        stride = 2 + (1 if dropout else 0)
    idx = 0
    for h in range(n_hidden):
        params[f"layer{h}"] = {"kernel": _conv_kernel(sd[f"{prefix}.layers.{idx}.weight"])}
        if f"{prefix}.layers.{idx}.bias" in sd:
            params[f"layer{h}"]["bias"] = np.asarray(sd[f"{prefix}.layers.{idx}.bias"])
        idx += 1
        if hidden_norm:
            p, s = _bn(sd, f"{prefix}.layers.{idx}")
            params[f"norm{h}"] = p
            stats[f"norm{h}"] = s
            idx += 1
        idx += 1  # activation
        if dropout:
            idx += 1
    params["out"] = {"kernel": _conv_kernel(sd[f"{prefix}.layers.{idx}.weight"])}
    if f"{prefix}.layers.{idx}.bias" in sd:
        params["out"]["bias"] = np.asarray(sd[f"{prefix}.layers.{idx}.bias"])
    idx += 1
    if out_norm:
        p, s = _bn(sd, f"{prefix}.layers.{idx}")
        params["out_norm"] = p
        stats["out_norm"] = s
    return params, stats


def _encoder_layer(sd, prefix, nhead):
    return {
        "self_attn": _mha(sd, prefix + ".self_attn.", nhead),
        "linear1": _linear(sd, prefix + ".linear1"),
        "linear2": _linear(sd, prefix + ".linear2"),
        "norm1": _ln(sd, prefix + ".norm1"),
        "norm2": _ln(sd, prefix + ".norm2"),
    }


def _decoder_layer(sd, prefix, nhead):
    out = _encoder_layer(sd, prefix, nhead)
    out["multihead_attn"] = _mha(sd, prefix + ".multihead_attn.", nhead)
    out["norm3"] = _ln(sd, prefix + ".norm3")
    return out


def convert_reference_state_dict(
    sd: Dict[str, np.ndarray],
    enc_nlayers: int = 3,
    dec_nlayers: int = 8,
    enc_nhead: int = 4,
    dec_nhead: int = 4,
    n_preenc_convs: int = 3,
) -> Tuple[dict, dict, dict, float]:
    """Returns (params, batch_stats, constants, logit_scale)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    # pre-encoder SharedMLP (Conv2d + BN2d stacks)
    pe_params, pe_stats = {}, {}
    for i in range(n_preenc_convs):
        pe_params[f"conv{i}"] = {
            "kernel": _conv_kernel(sd[f"pre_encoder.mlp_module.layer{i}.conv.weight"])
        }
        p, s = _bn(sd, f"pre_encoder.mlp_module.layer{i}.bn.bn")
        pe_params[f"bn{i}"] = p
        pe_stats[f"bn{i}"] = s
    params["pre_encoder"] = {"mlp_module": pe_params}
    stats["pre_encoder"] = {"mlp_module": pe_stats}

    params["encoder"] = {
        f"layer{i}": _encoder_layer(sd, f"encoder.layers.{i}", enc_nhead)
        for i in range(enc_nlayers)
    }
    dec = {
        f"layer{i}": _decoder_layer(sd, f"decoder.layers.{i}", dec_nhead)
        for i in range(dec_nlayers)
    }
    dec["norm"] = _ln(sd, "decoder.norm")
    params["decoder"] = dec

    p, s = _generic_mlp(
        sd, "encoder_to_decoder_projection", hidden_norm=True, n_hidden=2,
        out_norm=True, dropout=False,
    )
    params["encoder_to_decoder_projection"] = p
    stats["encoder_to_decoder_projection"] = s

    p, _ = _generic_mlp(
        sd, "query_projection", hidden_norm=False, n_hidden=1, out_norm=False,
        dropout=False,
    )
    params["query_projection"] = p

    head_names = [
        "sem_cls_head", "center_head", "size_head", "angle_cls_head",
        "angle_residual_head", "text_correlation_head",
    ]
    for name in head_names:
        if f"mlp_heads.{name}.layers.0.weight" not in sd:
            continue
        p, s = _generic_mlp(
            sd, f"mlp_heads.{name}", hidden_norm=True, n_hidden=2,
            out_norm=False, dropout=True,
        )
        params[name] = p
        stats[name] = s

    constants = {}
    if "pos_embedding.gauss_B" in sd:
        constants["pos_embedding"] = {"gauss_B": np.asarray(sd["pos_embedding.gauss_B"])}

    logit_scale = float(sd.get("logit_scale", np.log(100.0)))
    return params, stats, constants, logit_scale


def load_reference_checkpoint(path: str, **kw):
    """Load a reference .pth (torch pickle with {'model': state_dict, ...},
    reference utils/io.py:8-30) and convert."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    # strip DDP prefixes
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    return convert_reference_state_dict(sd, **kw)


# --------------------------------------------------------------------------
# Inverse direction: CoDA-TPU flax variables -> reference-format state dict.
# Lets a model trained here be loaded by the reference codebase
# (load_state_dict on Model3DETR*Head, /root/reference/main.py:908-909) --
# the migration path BACK is part of drop-in replaceability.


def _inv_conv_kernel(k):  # (I, O) -> (O, I, 1)  (reference uses Conv1d in MLPs)
    return np.asarray(k).T[..., None]


def _inv_linear(out, sd, prefix):
    sd[prefix + ".weight"] = np.asarray(out["kernel"]).T
    if "bias" in out:
        sd[prefix + ".bias"] = np.asarray(out["bias"])


def _inv_ln(p, sd, prefix):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _inv_bn(p, s, sd, prefix):
    _inv_ln(p, sd, prefix)
    sd[prefix + ".running_mean"] = np.asarray(s["mean"])
    sd[prefix + ".running_var"] = np.asarray(s["var"])
    sd[prefix + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _inv_mha(p, sd, prefix):
    """flax MHA (kernels (in, heads, hd)) -> torch in_proj/out_proj."""
    ws, bs = [], []
    for name in ["query", "key", "value"]:
        k = np.asarray(p[name]["kernel"])  # (in, heads, hd)
        width_in = k.shape[0]
        ws.append(k.reshape(width_in, -1).T)  # (out, in)
        bs.append(np.asarray(p[name]["bias"]).reshape(-1))
    sd[prefix + "in_proj_weight"] = np.concatenate(ws, axis=0)
    sd[prefix + "in_proj_bias"] = np.concatenate(bs, axis=0)
    k = np.asarray(p["out"]["kernel"])  # (heads, hd, out)
    sd[prefix + "out_proj.weight"] = k.reshape(-1, k.shape[-1]).T
    sd[prefix + "out_proj.bias"] = np.asarray(p["out"]["bias"])


def _inv_encoder_layer(p, sd, prefix):
    _inv_mha(p["self_attn"], sd, prefix + ".self_attn.")
    _inv_linear(p["linear1"], sd, prefix + ".linear1")
    _inv_linear(p["linear2"], sd, prefix + ".linear2")
    _inv_ln(p["norm1"], sd, prefix + ".norm1")
    _inv_ln(p["norm2"], sd, prefix + ".norm2")


def _inv_decoder_layer(p, sd, prefix):
    _inv_encoder_layer(p, sd, prefix)
    _inv_mha(p["multihead_attn"], sd, prefix + ".multihead_attn.")
    _inv_ln(p["norm3"], sd, prefix + ".norm3")


def _inv_generic_mlp(p, s, sd, prefix, hidden_norm: bool, n_hidden: int,
                     out_norm: bool, dropout: bool):
    stride = 3 + (1 if dropout else 0)
    if not hidden_norm:
        stride = 2 + (1 if dropout else 0)
    idx = 0
    for h in range(n_hidden):
        layer = p[f"layer{h}"]
        sd[f"{prefix}.layers.{idx}.weight"] = _inv_conv_kernel(layer["kernel"])
        if "bias" in layer:
            sd[f"{prefix}.layers.{idx}.bias"] = np.asarray(layer["bias"])
        idx += 1
        if hidden_norm:
            _inv_bn(p[f"norm{h}"], s[f"norm{h}"], sd, f"{prefix}.layers.{idx}")
            idx += 1
        idx += 1  # activation
        if dropout:
            idx += 1
    sd[f"{prefix}.layers.{idx}.weight"] = _inv_conv_kernel(p["out"]["kernel"])
    if "bias" in p["out"]:
        sd[f"{prefix}.layers.{idx}.bias"] = np.asarray(p["out"]["bias"])
    idx += 1
    if out_norm:
        _inv_bn(p["out_norm"], s["out_norm"], sd, f"{prefix}.layers.{idx}")


def export_reference_state_dict(
    params: dict,
    batch_stats: dict,
    constants: dict,
    logit_scale: float | None = None,
) -> Dict[str, np.ndarray]:
    """CoDA3DETR flax variables -> reference state-dict names/layouts (the
    exact inverse of convert_reference_state_dict; roundtrip-tested).  CLIP
    tower weights are NOT included (frozen, identical on both sides; the
    reference re-loads them from ViT-B-16.pt at model build,
    model_3detr.py:325-399)."""
    sd: Dict[str, np.ndarray] = {}

    pe_p = params["pre_encoder"]["mlp_module"]
    pe_s = batch_stats["pre_encoder"]["mlp_module"]
    n_convs = sum(1 for k in pe_p if k.startswith("conv"))
    for i in range(n_convs):
        # SharedMLP uses Conv2d 1x1 (pytorch_utils.py:8): (O, I, 1, 1)
        sd[f"pre_encoder.mlp_module.layer{i}.conv.weight"] = _inv_conv_kernel(
            pe_p[f"conv{i}"]["kernel"]
        )[..., None]
        _inv_bn(pe_p[f"bn{i}"], pe_s[f"bn{i}"], sd,
                f"pre_encoder.mlp_module.layer{i}.bn.bn")

    enc = params["encoder"]
    for name, layer in enc.items():
        if name.startswith("layer"):
            _inv_encoder_layer(layer, sd, f"encoder.layers.{name[5:]}")

    dec = params["decoder"]
    for name, layer in dec.items():
        if name.startswith("layer"):
            _inv_decoder_layer(layer, sd, f"decoder.layers.{name[5:]}")
    _inv_ln(dec["norm"], sd, "decoder.norm")

    _inv_generic_mlp(
        params["encoder_to_decoder_projection"],
        batch_stats["encoder_to_decoder_projection"],
        sd, "encoder_to_decoder_projection",
        hidden_norm=True, n_hidden=2, out_norm=True, dropout=False,
    )
    _inv_generic_mlp(
        params["query_projection"], {}, sd, "query_projection",
        hidden_norm=False, n_hidden=1, out_norm=False, dropout=False,
    )
    for name in ("sem_cls_head", "center_head", "size_head", "angle_cls_head",
                 "angle_residual_head", "text_correlation_head"):
        if name not in params:
            continue
        _inv_generic_mlp(
            params[name], batch_stats.get(name, {}), sd, f"mlp_heads.{name}",
            hidden_norm=True, n_hidden=2, out_norm=False, dropout=True,
        )

    if constants.get("pos_embedding", {}).get("gauss_B") is not None:
        sd["pos_embedding.gauss_B"] = np.asarray(constants["pos_embedding"]["gauss_B"])
    if logit_scale is not None:
        # raw LOG-scale parameter, matching what convert_reference_state_dict
        # returns (the exp-clip happens at use, stages.py StageContext)
        sd["logit_scale"] = np.asarray(logit_scale, dtype=np.float32)
    return sd


def export_checkpoint_to_torch(checkpoint_dir: str, out_path: str,
                               filename: str = "last_checkpoint") -> str:
    """Orbax checkpoint (utils/io.py layout) -> reference-loadable .pth
    ({'model': state_dict, 'epoch': N}, reference utils/io.py:8-30)."""
    import torch

    from coda_neurips2023_tpu.engine import TrainState
    from coda_neurips2023_tpu.utils.io import load_checkpoint_tree

    tree, meta = load_checkpoint_tree(checkpoint_dir, filename)
    sd = export_reference_state_dict(
        tree["params"], tree.get("batch_stats", {}), tree.get("constants", {}),
        logit_scale=None,
    )
    payload = {
        "model": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        "epoch": int(meta.get("epoch", 0)),
        "best_val_metrics": meta.get("best_val_metrics", {}),
    }
    torch.save(payload, out_path)
    return out_path


def _cli():
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert checkpoints between this framework and the "
        "reference PyTorch format"
    )
    sub = ap.add_subparsers(dest="cmd", required=True)
    exp = sub.add_parser("export", help="orbax checkpoint dir -> reference .pth")
    exp.add_argument("checkpoint_dir")
    exp.add_argument("out_path")
    exp.add_argument("--filename", default="last_checkpoint")
    args = ap.parse_args()
    if args.cmd == "export":
        path = export_checkpoint_to_torch(
            args.checkpoint_dir, args.out_path, args.filename
        )
        print(f"wrote {path}")


if __name__ == "__main__":
    _cli()
