"""Import PyTorch Lightning reference checkpoints into framework pytrees.

The reference's cross-stage restore relies on Lightning .ckpt files whose
state_dict keys follow the module tree of
/root/reference/src/autoencoder/components.py (encoder.c1..c3, DenseBlocks as
fc1/fc2 with inner fc1+fc_bn, fc_z_out; decoder.fc1/fc2/dc1..dc4) and of the
roadmap models (ae.encoder..., fc1 head — roadmap_bce_v2.py:43,50). This
module maps those tensors into our NHWC/HWIO pytree layout (SURVEY.md §5.4:
"converter for reading the PyTorch rm.ckpt naming scheme"):

  Conv2d weight          OIHW   -> HWIO     (transpose 2,3,1,0)
  ConvTranspose2d weight [I,O,kh,kw] -> HWIO (transpose 2,3,0,1)
  Linear weight          [out,in] -> [in,out]
  BatchNorm              weight/bias -> scale/bias (params),
                         running_mean/var -> state

Requires torch only at import time of a checkpoint (lazy).
"""
from __future__ import annotations

import numpy as np


def _load_state_dict(path):
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        sd = blob["state_dict"]
        hparams = blob.get("hparams") or blob.get("hyper_parameters") or {}
        if hasattr(hparams, "__dict__") and not isinstance(hparams, dict):
            hparams = dict(vars(hparams))
    else:
        sd, hparams = blob, {}
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}, dict(hparams)


def _conv(sd, prefix):
    p = {"w": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"]
    return p


def _convT(sd, prefix):
    return {
        "w": np.transpose(sd[f"{prefix}.weight"], (2, 3, 0, 1)),
        "b": sd[f"{prefix}.bias"],
    }


def _linear(sd, prefix):
    return {"w": sd[f"{prefix}.weight"].T.copy(), "b": sd[f"{prefix}.bias"]}


def _dense_block(sd, prefix):
    params = {
        "fc": _linear(sd, f"{prefix}.fc1"),
        "bn": {"scale": sd[f"{prefix}.fc_bn.weight"], "bias": sd[f"{prefix}.fc_bn.bias"]},
    }
    state = {
        "bn": {
            "mean": sd[f"{prefix}.fc_bn.running_mean"],
            "var": sd[f"{prefix}.fc_bn.running_var"],
        }
    }
    return params, state


def import_encoder(sd, prefix="encoder"):
    """-> (params, state) for nn.autoencoder.Encoder."""
    p_fc1, s_fc1 = _dense_block(sd, f"{prefix}.fc1")
    p_fc2, s_fc2 = _dense_block(sd, f"{prefix}.fc2")
    params = {
        "c1": _conv(sd, f"{prefix}.c1"),
        "c2": _conv(sd, f"{prefix}.c2"),
        "c3": _conv(sd, f"{prefix}.c3"),
        "fc1": p_fc1,
        "fc2": p_fc2,
        "fc_z_out": _linear(sd, f"{prefix}.fc_z_out"),
    }
    return params, {"fc1": s_fc1, "fc2": s_fc2}


def import_decoder(sd, prefix="decoder"):
    p_fc1, s_fc1 = _dense_block(sd, f"{prefix}.fc1")
    p_fc2, s_fc2 = _dense_block(sd, f"{prefix}.fc2")
    params = {"fc1": p_fc1, "fc2": p_fc2}
    for i in (1, 2, 3, 4):
        params[f"dc{i}"] = _convT(sd, f"{prefix}.dc{i}")
    return params, {"fc1": s_fc1, "fc2": s_fc2}


def import_basic_ae(path):
    """Lightning BasicAE ckpt -> (params, state, hparams) in framework layout."""
    sd, hparams = _load_state_dict(path)
    pe, se = import_encoder(sd, "encoder")
    pd, sdd = import_decoder(sd, "decoder")
    return {"encoder": pe, "decoder": pd}, {"encoder": se, "decoder": sdd}, hparams


def import_roadmap(path):
    """Lightning roadmap ckpt (RoadMap/RoadMapBCE*, with `ae.encoder` backbone
    and `fc1` head — roadmap_bce_v2.py:43,50) -> (params, state, hparams)."""
    sd, hparams = _load_state_dict(path)
    pe, se = import_encoder(sd, "ae.encoder")
    params = {"encoder": pe, "fc1": _linear(sd, "fc1")}
    return params, {"encoder": se}, hparams


def convert_roadmap_ckpt(torch_path, out_path, extra_hparams=None):
    """rm.ckpt -> framework .ckpt usable by cli/run_test.py."""
    from driving_dirty_tpu.checkpoints import io as ckpt_io

    params, state, hparams = import_roadmap(torch_path)
    hp = {"pretrained_path": None}
    hp.update({k: v for k, v in hparams.items() if isinstance(v, (int, float, str, bool))})
    # run_test rebuilds via RoadMapBCEv2 + embedded AE dims
    latent = params["fc1"]["w"].shape[0]
    hidden = params["encoder"]["fc_z_out"]["w"].shape[0]
    hp.setdefault("ae_latent_dim", int(latent))
    hp.setdefault("ae_hidden_dim", int(hidden))
    hp.update(extra_hparams or {})
    ckpt_io.save(out_path, params=params, state=state, hparams=hp,
                 meta={"source": str(torch_path), "format": "torch-lightning"})
    return out_path


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="Convert a reference PyTorch ckpt")
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--kind", choices=["roadmap", "basic_ae"], default="roadmap")
    a = ap.parse_args(argv)
    if a.kind == "roadmap":
        convert_roadmap_ckpt(a.torch_ckpt, a.out)
    else:
        from driving_dirty_tpu.checkpoints import io as ckpt_io

        params, state, hparams = import_basic_ae(a.torch_ckpt)
        hp = {k: v for k, v in hparams.items() if isinstance(v, (int, float, str, bool))}
        ckpt_io.save(a.out, params=params, state=state, hparams=hp,
                     meta={"source": a.torch_ckpt, "format": "torch-lightning"})
    print(f"converted {a.torch_ckpt} -> {a.out}")


if __name__ == "__main__":
    main()
