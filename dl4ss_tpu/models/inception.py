"""Inception-v3 — the frozen video-frame trunk of the reference.

Rebuilds Torch_multi/myNet.py (a torchvision Inception3 copy modified to
also return the 2048-d penultimate feature, myNet.py:123-128) as functional
JAX: BasicConv2d = conv + batchnorm(eval mode) + relu, the A/B/C/D/E
inception blocks, the aux head, and a forward that returns
(logits, aux_logits, penultimate) exactly like the reference's
`return x, aux, hidden` contract. Weights can be imported from a local
torchvision `.pth` state_dict (`load_torch_state_dict`) — matching the
reference's local-file pretrained load (myNet.py:29) — or randomly
initialized for training from scratch.

Inference-mode batchnorm only (the reference freezes the whole trunk,
main_run.py:232-235), folded as scale/shift.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv_params(rng, in_ch, out_ch, kh, kw):
    k = jax.random.split(rng, 1)[0]
    scale = np.sqrt(2.0 / (in_ch * kh * kw))  # he-normal-ish (trunc normal)
    return {
        "w": scale * jax.random.truncated_normal(
            k, -2, 2, (kh, kw, in_ch, out_ch), jnp.float32),
        "scale": jnp.ones((out_ch,), jnp.float32),   # gamma / sqrt(var+eps)
        "shift": jnp.zeros((out_ch,), jnp.float32),  # beta - mean * scale
    }


def _basic_conv(p, x, stride=(1, 1), padding="VALID"):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jax.nn.relu(y * p["scale"] + p["shift"])


def _pool(x, kind, window=3, stride=1, padding="SAME"):
    if kind == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, window, window, 1),
                                     (1, stride, stride, 1), padding)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                   (1, window, window, 1),
                                   (1, stride, stride, 1), padding)
    # torchvision's branch pools are F.avg_pool2d(count_include_pad=True):
    # the divisor is ALWAYS window^2, including zero-padded border windows
    # (dividing by the valid count instead skews every border activation
    # and breaks .pth parity)
    return summed / float(window * window)


def _split(rng, n):
    return list(jax.random.split(rng, n))


def init_inception_v3(key, num_classes: int = 1000) -> Dict:
    """Parameter pytree mirroring torchvision's module names."""
    ks = iter(_split(key, 128))

    def conv(i, o, kh, kw):
        return _conv_params(next(ks), i, o, kh, kw)

    p = {
        "Conv2d_1a_3x3": conv(3, 32, 3, 3),
        "Conv2d_2a_3x3": conv(32, 32, 3, 3),
        "Conv2d_2b_3x3": conv(32, 64, 3, 3),
        "Conv2d_3b_1x1": conv(64, 80, 1, 1),
        "Conv2d_4a_3x3": conv(80, 192, 3, 3),
    }

    def block_a(in_ch, pool_ch):
        return {
            "branch1x1": conv(in_ch, 64, 1, 1),
            "branch5x5_1": conv(in_ch, 48, 1, 1),
            "branch5x5_2": conv(48, 64, 5, 5),
            "branch3x3dbl_1": conv(in_ch, 64, 1, 1),
            "branch3x3dbl_2": conv(64, 96, 3, 3),
            "branch3x3dbl_3": conv(96, 96, 3, 3),
            "branch_pool": conv(in_ch, pool_ch, 1, 1),
        }

    p["Mixed_5b"] = block_a(192, 32)
    p["Mixed_5c"] = block_a(256, 64)
    p["Mixed_5d"] = block_a(288, 64)
    p["Mixed_6a"] = {
        "branch3x3": conv(288, 384, 3, 3),
        "branch3x3dbl_1": conv(288, 64, 1, 1),
        "branch3x3dbl_2": conv(64, 96, 3, 3),
        "branch3x3dbl_3": conv(96, 96, 3, 3),
    }

    def block_c(ch7):
        return {
            "branch1x1": conv(768, 192, 1, 1),
            "branch7x7_1": conv(768, ch7, 1, 1),
            "branch7x7_2": conv(ch7, ch7, 1, 7),
            "branch7x7_3": conv(ch7, 192, 7, 1),
            "branch7x7dbl_1": conv(768, ch7, 1, 1),
            "branch7x7dbl_2": conv(ch7, ch7, 7, 1),
            "branch7x7dbl_3": conv(ch7, ch7, 1, 7),
            "branch7x7dbl_4": conv(ch7, ch7, 7, 1),
            "branch7x7dbl_5": conv(ch7, 192, 1, 7),
            "branch_pool": conv(768, 192, 1, 1),
        }

    p["Mixed_6b"] = block_c(128)
    p["Mixed_6c"] = block_c(160)
    p["Mixed_6d"] = block_c(160)
    p["Mixed_6e"] = block_c(192)
    p["AuxLogits"] = {
        "conv0": conv(768, 128, 1, 1),
        "conv1": conv(128, 768, 5, 5),
        "fc": {"w": 0.001 * jax.random.normal(next(ks), (768, num_classes)),
               "b": jnp.zeros((num_classes,))},
    }
    p["Mixed_7a"] = {
        "branch3x3_1": conv(768, 192, 1, 1),
        "branch3x3_2": conv(192, 320, 3, 3),
        "branch7x7x3_1": conv(768, 192, 1, 1),
        "branch7x7x3_2": conv(192, 192, 1, 7),
        "branch7x7x3_3": conv(192, 192, 7, 1),
        "branch7x7x3_4": conv(192, 192, 3, 3),
    }

    def block_e(in_ch):
        return {
            "branch1x1": conv(in_ch, 320, 1, 1),
            "branch3x3_1": conv(in_ch, 384, 1, 1),
            "branch3x3_2a": conv(384, 384, 1, 3),
            "branch3x3_2b": conv(384, 384, 3, 1),
            "branch3x3dbl_1": conv(in_ch, 448, 1, 1),
            "branch3x3dbl_2": conv(448, 384, 3, 3),
            "branch3x3dbl_3a": conv(384, 384, 1, 3),
            "branch3x3dbl_3b": conv(384, 384, 3, 1),
            "branch_pool": conv(in_ch, 192, 1, 1),
        }

    p["Mixed_7b"] = block_e(1280)
    p["Mixed_7c"] = block_e(2048)
    p["fc"] = {"w": 0.001 * jax.random.normal(next(ks), (2048, num_classes)),
               "b": jnp.zeros((num_classes,))}
    return p


def _block_a_fwd(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b5 = _basic_conv(p["branch5x5_2"],
                     _basic_conv(p["branch5x5_1"], x), padding="SAME")
    b3 = _basic_conv(p["branch3x3dbl_1"], x)
    b3 = _basic_conv(p["branch3x3dbl_2"], b3, padding="SAME")
    b3 = _basic_conv(p["branch3x3dbl_3"], b3, padding="SAME")
    bp = _basic_conv(p["branch_pool"], _pool(x, "avg"))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_c_fwd(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b7 = _basic_conv(p["branch7x7_1"], x)
    b7 = _basic_conv(p["branch7x7_2"], b7, padding="SAME")
    b7 = _basic_conv(p["branch7x7_3"], b7, padding="SAME")
    bd = _basic_conv(p["branch7x7dbl_1"], x)
    for name in ["branch7x7dbl_2", "branch7x7dbl_3", "branch7x7dbl_4",
                 "branch7x7dbl_5"]:
        bd = _basic_conv(p[name], bd, padding="SAME")
    bp = _basic_conv(p["branch_pool"], _pool(x, "avg"))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_e_fwd(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b3 = _basic_conv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _basic_conv(p["branch3x3_2a"], b3, padding="SAME"),
        _basic_conv(p["branch3x3_2b"], b3, padding="SAME")], axis=-1)
    bd = _basic_conv(p["branch3x3dbl_1"], x)
    bd = _basic_conv(p["branch3x3dbl_2"], bd, padding="SAME")
    bd = jnp.concatenate([
        _basic_conv(p["branch3x3dbl_3a"], bd, padding="SAME"),
        _basic_conv(p["branch3x3dbl_3b"], bd, padding="SAME")], axis=-1)
    bp = _basic_conv(p["branch_pool"], _pool(x, "avg"))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def apply_inception_v3(p, x: jax.Array, aux: bool = False
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x: (B, 299, 299, 3) NHWC in [-1, 1] (torchvision normalization is the
    caller's job). Returns (logits, aux_logits|None, penultimate 2048-d) —
    the 3-tuple contract the reference's VIDEO_QUERY consumes via `[2]`
    (main_run.py:234)."""
    x = _basic_conv(p["Conv2d_1a_3x3"], x, stride=(2, 2))
    x = _basic_conv(p["Conv2d_2a_3x3"], x)
    x = _basic_conv(p["Conv2d_2b_3x3"], x, padding="SAME")
    x = _pool(x, "max", 3, 2, "VALID")
    x = _basic_conv(p["Conv2d_3b_1x1"], x)
    x = _basic_conv(p["Conv2d_4a_3x3"], x)
    x = _pool(x, "max", 3, 2, "VALID")
    x = _block_a_fwd(p["Mixed_5b"], x)
    x = _block_a_fwd(p["Mixed_5c"], x)
    x = _block_a_fwd(p["Mixed_5d"], x)
    # Mixed_6a (grid reduction)
    pa = p["Mixed_6a"]
    b3 = _basic_conv(pa["branch3x3"], x, stride=(2, 2))
    bd = _basic_conv(pa["branch3x3dbl_1"], x)
    bd = _basic_conv(pa["branch3x3dbl_2"], bd, padding="SAME")
    bd = _basic_conv(pa["branch3x3dbl_3"], bd, stride=(2, 2))
    x = jnp.concatenate([b3, bd, _pool(x, "max", 3, 2, "VALID")], axis=-1)
    x = _block_c_fwd(p["Mixed_6b"], x)
    x = _block_c_fwd(p["Mixed_6c"], x)
    x = _block_c_fwd(p["Mixed_6d"], x)
    x = _block_c_fwd(p["Mixed_6e"], x)
    aux_logits = None
    if aux:
        a = _pool(x, "avg", 5, 3, "VALID")
        a = _basic_conv(p["AuxLogits"]["conv0"], a)
        a = _basic_conv(p["AuxLogits"]["conv1"], a)
        a = jnp.mean(a, axis=(1, 2))
        aux_logits = a @ p["AuxLogits"]["fc"]["w"] + p["AuxLogits"]["fc"]["b"]
    # Mixed_7a (grid reduction)
    pa = p["Mixed_7a"]
    b3 = _basic_conv(pa["branch3x3_2"],
                     _basic_conv(pa["branch3x3_1"], x), stride=(2, 2))
    b7 = _basic_conv(pa["branch7x7x3_1"], x)
    b7 = _basic_conv(pa["branch7x7x3_2"], b7, padding="SAME")
    b7 = _basic_conv(pa["branch7x7x3_3"], b7, padding="SAME")
    b7 = _basic_conv(pa["branch7x7x3_4"], b7, stride=(2, 2))
    x = jnp.concatenate([b3, b7, _pool(x, "max", 3, 2, "VALID")], axis=-1)
    x = _block_e_fwd(p["Mixed_7b"], x)
    x = _block_e_fwd(p["Mixed_7c"], x)
    hidden = jnp.mean(x, axis=(1, 2))                 # (B, 2048) penultimate
    logits = hidden @ p["fc"]["w"] + p["fc"]["b"]
    return logits, aux_logits, hidden


def load_torch_state_dict(path_or_dict, num_classes: int = 1000,
                          eps: float = 1e-3) -> Dict:
    """Import a torchvision inception_v3 state_dict (.pth path or dict),
    folding eval-mode batchnorm into scale/shift."""
    if not isinstance(path_or_dict, dict):
        import torch
        path_or_dict = torch.load(path_or_dict, map_location="cpu",
                                  weights_only=True)
    sd = {k: np.asarray(v) for k, v in path_or_dict.items()}
    params = jax.tree_util.tree_map(np.asarray,
                                    init_inception_v3(jax.random.PRNGKey(0),
                                                      num_classes))

    def fill(dst, prefix):
        if "scale" in dst:  # BasicConv2d
            w = sd[prefix + ".conv.weight"]          # (O, I, H, W)
            dst["w"] = np.transpose(w, (2, 3, 1, 0))
            gamma = sd[prefix + ".bn.weight"]
            beta = sd[prefix + ".bn.bias"]
            mean = sd[prefix + ".bn.running_mean"]
            var = sd[prefix + ".bn.running_var"]
            scale = gamma / np.sqrt(var + eps)
            dst["scale"] = scale.astype(np.float32)
            dst["shift"] = (beta - mean * scale).astype(np.float32)
        elif "b" in dst:  # Linear
            dst["w"] = np.transpose(sd[prefix + ".weight"])
            dst["b"] = sd[prefix + ".bias"]
        else:
            for k in dst:
                fill(dst[k], f"{prefix}.{k}" if prefix else k)

    for top, dst in params.items():
        if top in ("fc",):
            fill(dst, top)
        elif top == "AuxLogits":
            fill(dst["conv0"], "AuxLogits.conv0")
            fill(dst["conv1"], "AuxLogits.conv1")
            fill(dst["fc"], "AuxLogits.fc")
        elif "scale" in dst:
            fill(dst, top)
        else:
            for k in dst:
                fill(dst[k], f"{top}.{k}")
    return jax.tree_util.tree_map(jnp.asarray, params)
