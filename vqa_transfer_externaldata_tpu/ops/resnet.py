"""ResNet-101 v1 image backbone (reference C4: tf-slim ``resnet_v1_101``
applied offline to COCO/Visual Genome JPEGs, emitting the 14x14x2048 conv5
grid + pool5 vector consumed by every model — SURVEY.md sections 2/3.4).

TPU-first build: bottleneck blocks with the stride on the 3x3 conv (the
tf-slim/v1.5 convention, so public checkpoints convert layer-for-layer),
bf16 compute with f32 params/BN stats, NHWC layout (XLA TPU native), and
inference-mode BatchNorm by default — the reference always runs the
extractor frozen, which also keeps the param tree free of mutable
collections. 448x448 inputs -> output stride 32 -> 14x14 grid.

``convert_torch_state_dict`` maps a torchvision-format ``resnet101``
state dict onto this module's param tree for checkpoint-fidelity work.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

RESNET101_STAGES = (3, 4, 23, 3)
# tf-slim v1 preprocessing: RGB mean subtraction, no scaling.
RGB_MEAN = (123.68, 116.779, 103.939)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        # Explicit symmetric padding (k//2): matches torch / tf-slim
        # ``conv2d_same`` for strided convs, where flax "SAME" pads
        # asymmetrically and shifts the grid.
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)

        residual = x
        out = nn.relu(bn("bn1")(conv(self.features, 1, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.features, 3, self.stride,
                                     "conv2")(out)))
        out = bn("bn3")(conv(4 * self.features, 1, 1, "conv3")(out))
        if residual.shape[-1] != out.shape[-1] or self.stride != 1:
            residual = bn("bn_proj")(conv(4 * self.features, 1, self.stride,
                                          "conv_proj")(x))
        return nn.relu(out + residual)


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/b, W/b, b*b*C], channel index (dy, dx, c)."""
    B, H, W, C = x.shape
    b = block
    x = x.reshape(B, H // b, b, W // b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // b, W // b, b * b * C)


def conv1_to_space_to_depth(w7: np.ndarray) -> np.ndarray:
    """[7,7,C,O] stem weights -> the equivalent [4,4,4C,O] kernel applied
    (stride 1, padding (2,1)) to a space-to-depth(2) input. Derivation:
    with S[Y,X,(dy,dx,c)] = I[2Y+dy, 2X+dx, c], the 7x7/s2/p3 conv output
    equals a 4x4/s1 conv whose tap (kY,kX,dy,dx) reads original tap
    (2kY+dy-1, 2kX+dx-1) — out-of-range taps are zero."""
    C, O = w7.shape[2], w7.shape[3]
    out = np.zeros((4, 4, 4 * C, O), w7.dtype)
    for kY in range(4):
        for kX in range(4):
            for dy in range(2):
                for dx in range(2):
                    ky, kx = 2 * kY + dy - 1, 2 * kX + dx - 1
                    if 0 <= ky < 7 and 0 <= kx < 7:
                        d = (dy * 2 + dx) * C
                        out[kY, kX, d:d + C] = w7[ky, kx]
    return out


def conv1_to_space_to_depth4(w7: np.ndarray) -> np.ndarray:
    """[7,7,C,O] stem weights -> the equivalent [3,3,16C,4O] kernel for the
    ``space_to_depth_4`` stem: input space-to-depth(4) (channel index
    (dy, dx, c), dy/dx in 0..3), output the four conv1 stride-phases
    packed as channel index (ry, rx, o), ry/rx in 0..1 — i.e. output cell
    Q of the 112-grid holds conv1 outputs (2Q+ry, 2Q+rx) of the 224-grid.
    Derivation: original tap t = 4(Q + kY - 1) + dy must equal
    4Q + 2r - 3 + k for the 7x7/s2/p3 conv, so k = 4*kY + dy - 2r - 1;
    taps with k outside 0..6 are zero."""
    C, O = w7.shape[2], w7.shape[3]
    out = np.zeros((3, 3, 16 * C, 4 * O), w7.dtype)
    for kY in range(3):
        for kX in range(3):
            for dy in range(4):
                for dx in range(4):
                    for ry in range(2):
                        for rx in range(2):
                            ky = 4 * kY + dy - 2 * ry - 1
                            kx = 4 * kX + dx - 2 * rx - 1
                            if 0 <= ky < 7 and 0 <= kx < 7:
                                ci = (dy * 4 + dx) * C
                                oi = (ry * 2 + rx) * O
                                out[kY, kX, ci:ci + C, oi:oi + O] = \
                                    w7[ky, kx]
    return out


class ResNetV1(nn.Module):
    """Returns {"grid": [B, H/32, W/32, 2048], "pool5": [B, 2048]}.

    ``stem="space_to_depth"``: the 7x7/s2 stem conv is mathematically
    rewritten as a 4x4/s1 conv over a space-to-depth(2) input — 12 input
    channels instead of 3, which the MXU tiles far better (the classic TPU
    ResNet optimization). Pretrained 7x7 weights convert exactly via
    :func:`conv1_to_space_to_depth`.
    """

    stage_sizes: Sequence[int] = RESNET101_STAGES
    width: int = 64
    dtype: Any = jnp.bfloat16
    stem: str = "conv"  # "conv" | "space_to_depth"

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 *, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        if self.stem == "space_to_depth_4":
            # Deepest stem folding: the FULL stem (7x7/s2 conv -> BN ->
            # relu -> 3x3/s2 maxpool) computed without any 224-grid tensor
            # touching HBM. s2d(4) -> ONE MXU-friendly 3x3x48->256 conv at
            # 112^2 (the four conv1 stride-phases (ry, rx) packed in the
            # output channels; exact weights via conv1_to_space_to_depth4)
            # -> BN/relu on the [..., 4, width] view (pointwise, commutes
            # with the packing) -> the maxpool as a 9-way shifted max:
            # pool output m covers 224-positions {2m-1, 2m, 2m+1} =
            # phases {(m-1, r=1), (m, r=0), (m, r=1)} per axis.
            #
            # MEASURED AND NOT DEFAULT (2026-08-17, v5e, B=32, 448^2):
            # 23.2 ms/step vs 20.1 for the s2d(2) stem. The conv itself
            # improves (114 vs 36 TF/s — 0.78 vs 1.09 ms despite 2.3x the
            # FLOPs), but the [B,112,112,4,64] views around BN/relu/max
            # cost 3.3 ms of XLA layout copies (profiled: a 1.35 ms
            # convert-copy feeding bn1, 1.04 ms relu materialization,
            # 0.59 ms squeeze) — more than the 2.6 ms the whole s2d(2)
            # stem region costs. Kept as an exact-tested variant
            # (tests/test_resnet.py::test_space_to_depth4_resnet_matches
            # _conv_stem) for shapes where a 4D-only rewrite may win.
            x = space_to_depth(x, 4)  # [B, S/4, S/4, 48]
            x = nn.Conv(4 * self.width, (3, 3), strides=(1, 1),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv1")(x)
            B, Hq, Wq, _ = x.shape
            x = x.reshape(B, Hq, Wq, 4, self.width)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name="bn1")(x)
            x = nn.relu(x)
            x = x.reshape(B, Hq, Wq, 2, 2, self.width)
            neg = jnp.asarray(-np.inf, x.dtype)
            # m-1 cells: shift down by one (front-pad with -inf).
            prev_y = jnp.pad(x[:, :-1, :, 1], ((0, 0), (1, 0), (0, 0),
                                               (0, 0), (0, 0)),
                             constant_values=neg)
            x = jnp.maximum(jnp.maximum(prev_y, x[:, :, :, 0]),
                            x[:, :, :, 1])  # [B, Hq, Wq, 2, width]
            prev_x = jnp.pad(x[:, :, :-1, 1], ((0, 0), (0, 0), (1, 0),
                                               (0, 0)),
                             constant_values=neg)
            x = jnp.maximum(jnp.maximum(prev_x, x[:, :, :, 0]),
                            x[:, :, :, 1])  # [B, Hq, Wq, width]
        else:
            if self.stem == "space_to_depth":
                x = space_to_depth(x, 2)
                x = nn.Conv(self.width, (4, 4), strides=(1, 1),
                            padding=[(2, 1), (2, 1)], use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="conv1")(x)
            else:
                x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                            padding=[(3, 3), (3, 3)], use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="conv1")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])
        for stage, n_blocks in enumerate(self.stage_sizes):
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(self.width * (2 ** stage), stride=stride,
                               dtype=self.dtype,
                               name=f"layer{stage + 1}_{block}")(
                                   x, train=train)
        grid = x  # [B, h, w, 2048]
        pool5 = jnp.mean(grid.astype(jnp.float32), axis=(1, 2))
        return {"grid": grid, "pool5": pool5}


def preprocess_images(images_uint8: jnp.ndarray,
                      size: int = 448) -> jnp.ndarray:
    """On-device resize + tf-slim v1 normalization (jit-compatible).

    ``images_uint8``: [B, H, W, 3] uint8 RGB -> [B, size, size, 3] f32.
    """
    import jax

    x = images_uint8.astype(jnp.float32)
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, 3),
                             method="bilinear", antialias=True)
    return x - jnp.asarray(RGB_MEAN, jnp.float32)


# ---------------------------------------------------------------------------
# torchvision-format weight conversion (checkpoint fidelity, SURVEY.md §7)
# ---------------------------------------------------------------------------


def _conv(w: np.ndarray) -> np.ndarray:
    # torch OIHW -> flax HWIO
    return np.transpose(w, (2, 3, 1, 0))


def convert_torch_state_dict(sd: Dict[str, np.ndarray],
                             stage_sizes: Sequence[int] = RESNET101_STAGES,
                             stem: str = "conv") -> Tuple[Dict, Dict]:
    """torchvision ``resnet101().state_dict()`` -> (params, batch_stats).

    ``stem="space_to_depth"`` / ``"space_to_depth_4"`` additionally
    rewrites the 7x7 stem kernel into the exact space-to-depth form
    (conv1_to_space_to_depth / conv1_to_space_to_depth4)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(dst_p, dst_s, src):
        dst_p["scale"] = sd[f"{src}.weight"]
        dst_p["bias"] = sd[f"{src}.bias"]
        dst_s["mean"] = sd[f"{src}.running_mean"]
        dst_s["var"] = sd[f"{src}.running_var"]

    conv1 = _conv(sd["conv1.weight"])
    if stem == "space_to_depth":
        conv1 = conv1_to_space_to_depth(conv1)
    elif stem == "space_to_depth_4":
        conv1 = conv1_to_space_to_depth4(conv1)
    params["conv1"] = {"kernel": conv1}
    params["bn1"], stats["bn1"] = {}, {}
    put_bn(params["bn1"], stats["bn1"], "bn1")

    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            name = f"layer{stage + 1}_{block}"
            src = f"layer{stage + 1}.{block}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = {"kernel": _conv(sd[f"{src}.conv{i}.weight"])}
                p[f"bn{i}"], s[f"bn{i}"] = {}, {}
                put_bn(p[f"bn{i}"], s[f"bn{i}"], f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in sd:
                p["conv_proj"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])}
                p["bn_proj"], s["bn_proj"] = {}, {}
                put_bn(p["bn_proj"], s["bn_proj"], f"{src}.downsample.1")
            params[name] = p
            stats[name] = s
    return params, stats
