"""Convert an ESPnet Conformer-Transducer checkpoint (reazonspeech-espnet-v2)
into this framework's param tree.

The reference loads this through ESPnet's Speech2Text
(pkg/espnet-asr/src/transcribe.py:27-32). Input: the ``.pth`` state dict with
ESPnet naming:

    encoder.embed.conv.{0,2}.{weight,bias}           Conv2dSubsampling
    encoder.embed.out.0.{weight,bias}                flatten projection
    encoder.encoders.N.feed_forward.w_{1,2} / norm_ff
    encoder.encoders.N.feed_forward_macaron.w_{1,2} / norm_ff_macaron
    encoder.encoders.N.self_attn.{linear_q,linear_k,linear_v,linear_out,
        linear_pos,pos_bias_u,pos_bias_v} / norm_mha
    encoder.encoders.N.conv_module.{pointwise_conv1,depthwise_conv,norm,
        pointwise_conv2} / norm_conv
    encoder.encoders.N.norm_final
    encoder.after_norm
    ctc.ctc_lo.{weight,bias}
    decoder.* / joint_network.*                      (transducer variants)

ESPnet's macaron order is FFN_macaron → MHSA → conv → FFN, mapping onto our
block as ffn1 = feed_forward_macaron, ffn2 = feed_forward.
"""

import numpy as np

from ..models.fastconformer import FastConformerConfig
from .store import save_param_tree
from .torch_utils import (
    t_conv1d,
    t_conv2d,
    t_depthwise_conv1d,
    t_layer_norm,
    t_linear,
    to_numpy,
)

__all__ = ["convert_espnet_state_dict", "convert_espnet_checkpoint"]


def _ln(sd, prefix):
    return t_layer_norm(sd[f"{prefix}.weight"], sd[f"{prefix}.bias"])


def _lin(sd, prefix, bias=True):
    return t_linear(sd[f"{prefix}.weight"], sd.get(f"{prefix}.bias") if bias else None)


def convert_espnet_state_dict(sd, enc_cfg: FastConformerConfig, num_tokens=None):
    sd = {k: to_numpy(v) for k, v in sd.items()}

    sub = {
        "conv0": t_conv2d(sd["encoder.embed.conv.0.weight"], sd.get("encoder.embed.conv.0.bias")),
        "conv1": t_conv2d(sd["encoder.embed.conv.2.weight"], sd.get("encoder.embed.conv.2.bias")),
        "proj": _lin(sd, "encoder.embed.out.0"),
    }

    blocks = []
    for n in range(enc_cfg.num_layers):
        p = f"encoder.encoders.{n}"
        blk = {
            "ffn1_ln": _ln(sd, f"{p}.norm_ff_macaron"),
            "ffn1_in": _lin(sd, f"{p}.feed_forward_macaron.w_1"),
            "ffn1_out": _lin(sd, f"{p}.feed_forward_macaron.w_2"),
            "attn_ln": _ln(sd, f"{p}.norm_mha"),
            "attn_q": _lin(sd, f"{p}.self_attn.linear_q"),
            "attn_k": _lin(sd, f"{p}.self_attn.linear_k"),
            "attn_v": _lin(sd, f"{p}.self_attn.linear_v"),
            "attn_out": _lin(sd, f"{p}.self_attn.linear_out"),
            "attn_pos": _lin(sd, f"{p}.self_attn.linear_pos", bias=False),
            "attn_bias_u": sd[f"{p}.self_attn.pos_bias_u"],
            "attn_bias_v": sd[f"{p}.self_attn.pos_bias_v"],
            "conv_ln": _ln(sd, f"{p}.norm_conv"),
            "conv_in": t_conv1d(
                sd[f"{p}.conv_module.pointwise_conv1.weight"],
                sd.get(f"{p}.conv_module.pointwise_conv1.bias"),
            ),
            "conv_dw": t_depthwise_conv1d(
                sd[f"{p}.conv_module.depthwise_conv.weight"],
                sd.get(f"{p}.conv_module.depthwise_conv.bias"),
            ),
            # espnet conv module uses a norm (layer/batch depending on
            # recipe); our espnet preset uses layer_norm
            "conv_bn": _ln(sd, f"{p}.conv_module.norm"),
            "conv_out": t_conv1d(
                sd[f"{p}.conv_module.pointwise_conv2.weight"],
                sd.get(f"{p}.conv_module.pointwise_conv2.bias"),
            ),
            "ffn2_ln": _ln(sd, f"{p}.norm_ff"),
            "ffn2_in": _lin(sd, f"{p}.feed_forward.w_1"),
            "ffn2_out": _lin(sd, f"{p}.feed_forward.w_2"),
            "final_ln": _ln(sd, f"{p}.norm_final"),
        }
        blocks.append(blk)
    import jax

    stacked = jax.tree.map(lambda *xs: np.stack(xs), *blocks)

    params = {"encoder": {"subsampling": sub, "blocks": stacked}}
    if "ctc.ctc_lo.weight" in sd:
        params["ctc"] = {"out": _lin(sd, "ctc.ctc_lo")}
    return params


def convert_espnet_checkpoint(pth_path, out_path, enc_cfg=None):
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    if enc_cfg is None:
        from ..models.conformer import espnet_encoder_config

        enc_cfg = espnet_encoder_config()
    params = convert_espnet_state_dict(sd, enc_cfg)
    meta = {
        "flavor": "espnet",
        "enc_cfg": {k: getattr(enc_cfg, k) for k in enc_cfg.__dataclass_fields__},
    }
    save_param_tree(out_path, params, meta)
    return params, enc_cfg
