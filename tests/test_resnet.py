"""ResNet-101 backbone + end2end model (reference C4 / BASELINE config 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_transfer_externaldata_tpu.ops.resnet import (
    RESNET101_STAGES, ResNetV1, convert_torch_state_dict, preprocess_images)


@pytest.fixture(scope="module")
def tiny_resnet():
    # stage sizes [1,1,1,1] keeps CPU tests fast; same code path as 101.
    model = ResNetV1(stage_sizes=(1, 1, 1, 1), width=8, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


def test_output_shapes(tiny_resnet):
    model, variables, x = tiny_resnet
    out = model.apply(variables, x, train=False)
    # 64 / 32 = 2 -> 2x2 grid; channels = 8 * 8 * 4 = 256
    assert out["grid"].shape == (2, 2, 2, 256)
    assert out["pool5"].shape == (2, 256)


def test_param_count_resnet101():
    """Full ResNet-101 has ~44.5M params (conv+bn, no fc)."""
    model = ResNetV1(dtype=jnp.bfloat16)
    x = jnp.zeros((1, 448, 448, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    n = sum(int(np.prod(v.shape))
            for v in jax.tree_util.tree_leaves(variables["params"]))
    assert 42e6 < n < 46e6, n
    # 448 input -> 14x14 grid
    out = jax.eval_shape(lambda v: model.apply(v, x, train=False), variables)
    assert out["grid"].shape == (1, 14, 14, 2048)


def test_preprocess_images():
    imgs = jnp.asarray(np.full((2, 32, 32, 3), 128, np.uint8))
    out = preprocess_images(imgs, size=64)
    assert out.shape == (2, 64, 64, 3)
    # mean-subtracted: red channel = 128 - 123.68
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), 128 - 123.68,
                               atol=1e-3)


def test_torch_state_dict_conversion():
    """Converted torchvision-format weights produce identical outputs to a
    torch reference forward on the same tiny architecture."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    class TorchBottleneck(tnn.Module):
        def __init__(self, cin, width, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(width)
            self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(width)
            self.conv3 = tnn.Conv2d(width, 4 * width, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(4 * width)
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, 4 * width, 1, stride, bias=False),
                tnn.BatchNorm2d(4 * width))
            self.relu = tnn.ReLU()

        def forward(self, x):
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + self.downsample(x))

    class TorchNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 8, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(8)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(TorchBottleneck(8, 8, 1))
            self.layer2 = tnn.Sequential(TorchBottleneck(32, 16, 2))
            self.layer3 = tnn.Sequential(TorchBottleneck(64, 32, 2))
            self.layer4 = tnn.Sequential(TorchBottleneck(128, 64, 2))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer4(self.layer3(self.layer2(self.layer1(x))))

    torch.manual_seed(0)
    tmodel = TorchNet().eval()
    # randomize BN stats so the test can't pass with default zeros/ones
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    params, stats = convert_torch_state_dict(
        {k: v.numpy() for k, v in tmodel.state_dict().items()},
        stage_sizes=(1, 1, 1, 1))
    jmodel = ResNetV1(stage_sizes=(1, 1, 1, 1), width=8, dtype=jnp.float32)

    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    jout = jmodel.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=False)["grid"]
    np.testing.assert_allclose(
        np.asarray(jout), np.transpose(tout.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-4)


def test_space_to_depth_stem_equivalence():
    """The 4x4/s1 space-to-depth stem must reproduce the 7x7/s2 stem
    exactly (pure weight rewrite)."""
    import flax.linen as nn

    from vqa_transfer_externaldata_tpu.ops.resnet import (
        conv1_to_space_to_depth, space_to_depth)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    w7 = rng.normal(size=(7, 7, 3, 16)).astype(np.float32) * 0.1

    conv7 = nn.Conv(16, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False)
    y7 = conv7.apply({"params": {"kernel": jnp.asarray(w7)}}, x)

    conv4 = nn.Conv(16, (4, 4), strides=(1, 1), padding=[(2, 1), (2, 1)],
                    use_bias=False)
    w4 = conv1_to_space_to_depth(w7)
    y4 = conv4.apply({"params": {"kernel": jnp.asarray(w4)}},
                     space_to_depth(x, 2))
    assert y4.shape == y7.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y7),
                               rtol=1e-5, atol=1e-5)


def test_space_to_depth_resnet_matches_conv_stem():
    """Full tiny ResNet: both stems give identical outputs after the
    kernel rewrite."""
    from vqa_transfer_externaldata_tpu.ops.resnet import (
        ResNetV1, conv1_to_space_to_depth)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)) * 20, jnp.float32)
    m_conv = ResNetV1(stage_sizes=(1, 1, 1, 1), width=8, dtype=jnp.float32)
    variables = m_conv.init(jax.random.PRNGKey(0), x, train=False)
    out_conv = m_conv.apply(variables, x, train=False)

    import copy

    v2 = jax.tree_util.tree_map(lambda a: a, variables)
    params2 = dict(v2["params"])
    params2["conv1"] = {"kernel": jnp.asarray(conv1_to_space_to_depth(
        np.asarray(variables["params"]["conv1"]["kernel"])))}
    v2 = {"params": params2, "batch_stats": v2["batch_stats"]}
    m_s2d = ResNetV1(stage_sizes=(1, 1, 1, 1), width=8, dtype=jnp.float32,
                     stem="space_to_depth")
    out_s2d = m_s2d.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(out_s2d["grid"]),
                               np.asarray(out_conv["grid"]),
                               rtol=1e-4, atol=1e-4)


def test_space_to_depth4_resnet_matches_conv_stem():
    """space_to_depth_4 stem (full stem folding: 3x3x48->256 conv at the
    quarter grid + BN/relu on the packed view + the maxpool as a 9-way
    shifted max — no half-grid tensor ever materializes) must reproduce
    the plain 7x7 stem exactly after the kernel rewrite."""
    from vqa_transfer_externaldata_tpu.ops.resnet import (
        ResNetV1, conv1_to_space_to_depth4)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)) * 20, jnp.float32)
    m_conv = ResNetV1(stage_sizes=(1, 1, 1, 1), width=8, dtype=jnp.float32)
    variables = m_conv.init(jax.random.PRNGKey(0), x, train=False)
    out_conv = m_conv.apply(variables, x, train=False)

    params2 = dict(variables["params"])
    params2["conv1"] = {"kernel": jnp.asarray(conv1_to_space_to_depth4(
        np.asarray(variables["params"]["conv1"]["kernel"])))}
    v2 = {"params": params2, "batch_stats": variables["batch_stats"]}
    m_s2d4 = ResNetV1(stage_sizes=(1, 1, 1, 1), width=8,
                      dtype=jnp.float32, stem="space_to_depth_4")
    out_s2d4 = m_s2d4.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(out_s2d4["grid"]),
                               np.asarray(out_conv["grid"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_s2d4["pool5"]),
                               np.asarray(out_conv["pool5"]),
                               rtol=1e-4, atol=1e-4)


def test_end2end_model_forward(tiny_config):
    cfg = tiny_config.replace_flat({"model.model": "vqa_end2end",
                                    "data.image_size": 64})
    from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
    from vqa_transfer_externaldata_tpu.models.zoo import build_model

    spec = build_model(cfg)
    ds = load_dataset(cfg, "train", stage=spec.stage)
    batch = next(ds.batches(2, epochs=1, shuffle=False))
    variables = spec.module.init({"params": jax.random.PRNGKey(0)},
                                 *spec.inputs(batch), train=False)
    assert "batch_stats" in variables  # frozen BN stats live outside params
    out = spec.module.apply(variables, *spec.inputs(batch), train=False)
    assert out["logits"].shape == (2, cfg.data.num_answers)
    loss, _ = spec.loss(out, batch)
    assert np.isfinite(float(loss))
