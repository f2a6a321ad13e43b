"""Torch-weight import for the model_architectures.py backbones (D11).

The reference builds its CNN predictor on ImageNet-pretrained torchvision
resnet18 (model_architectures.py:13).  torchvision is not in this container,
so the parity oracle is a minimal torch re-statement of the torchvision
resnet18 feature graph (conv1/bn1/maxpool + 4 x 2 BasicBlocks + avgpool),
run with the SAME random state_dict that load_torch_resnet18 imports.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _torch_resnet18_modules():
    """torchvision-graph resnet18 feature extractor (fc dropped, which is
    exactly how the reference uses it: model_architectures.py:26)."""
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, inp, out, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(out)
            self.conv2 = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(out)
            self.downsample = None
            if stride != 1 or inp != out:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, out, 1, stride, bias=False),
                    tnn.BatchNorm2d(out),
                )

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idn)

    class Features(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(BasicBlock(64, 64),
                                         BasicBlock(64, 64))
            self.layer2 = tnn.Sequential(BasicBlock(64, 128, 2),
                                         BasicBlock(128, 128))
            self.layer3 = tnn.Sequential(BasicBlock(128, 256, 2),
                                         BasicBlock(256, 256))
            self.layer4 = tnn.Sequential(BasicBlock(256, 512, 2),
                                         BasicBlock(512, 512))

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            x = self.maxpool(x)
            for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = layer(x)
            return x.mean(dim=(2, 3))  # avgpool -> (B, 512)

    return Features()


class _FlaxBackbone:
    """CNNParameterPredictor's backbone slice (stem + 8 blocks + pool),
    applied with the imported variables — module call order matches
    models/zoo.py so the auto-generated names line up."""

    def __call__(self, variables, img):
        import flax.linen as nn

        from underwater_image_enhancement_tpu.models.zoo import ResNetBlock

        class Backbone(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(64, (7, 7), strides=2, padding=3,
                            use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=True)(x)
                x = nn.relu(x)
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)))
                for filters, strides in [(64, 1), (64, 1), (128, 2), (128, 1),
                                         (256, 2), (256, 1), (512, 2),
                                         (512, 1)]:
                    x = ResNetBlock(filters, strides)(x, train=False)
                return jnp.mean(x, axis=(1, 2))

        keep = ["Conv_0", "BatchNorm_0"] + [f"ResNetBlock_{i}"
                                            for i in range(8)]
        sub = {
            "params": {k: variables["params"][k] for k in keep},
            "batch_stats": {k: variables["batch_stats"][k]
                            for k in keep if k != "Conv_0"},
        }
        return Backbone().apply(sub, img)


def test_resnet18_import_matches_torch():
    """Imported torchvision-format weights reproduce the torch backbone's
    features (validates the OIHW->HWIO transpose, BN scale/bias/stats
    mapping, and the stem/stride/padding conventions)."""
    from underwater_image_enhancement_tpu.models.zoo import (
        CNNParameterPredictor,
        load_torch_resnet18,
    )

    torch.manual_seed(0)
    ref = _torch_resnet18_modules()
    # randomize running stats away from (0, 1) so the BN mapping is exercised
    with torch.no_grad():
        for m in ref.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    model = CNNParameterPredictor()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    imported = load_torch_resnet18(variables, ref.state_dict())

    x = np.random.default_rng(1).normal(0, 1, (2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(_FlaxBackbone()(imported, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    # full predictor still runs with the imported variables and produces
    # in-range params (heads stay randomly initialized, like the reference
    # keeps its own MLP on top of the pretrained trunk)
    out = model.apply(imported, jnp.asarray(x), train=False)
    from underwater_image_enhancement_tpu.models.zoo import SIX_PARAM_RANGES
    for name, (lo, hi) in SIX_PARAM_RANGES.items():
        v = np.asarray(out[name])
        assert np.all(v >= lo) and np.all(v <= hi)


def test_resnet18_npz_roundtrip(tmp_path):
    """state_dict -> .npz artifact -> load_resnet18_npz round-trip."""
    from underwater_image_enhancement_tpu.models.zoo import (
        CNNParameterPredictor,
        load_resnet18_npz,
        load_torch_resnet18,
    )

    torch.manual_seed(1)
    ref = _torch_resnet18_modules()
    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    npz = tmp_path / "resnet18.npz"
    np.savez(npz, **state)

    model = CNNParameterPredictor()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    a = load_resnet18_npz(variables, str(npz))
    b = load_torch_resnet18(variables, ref.state_dict())
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _torch_efficientnet_modules(variant="b0"):
    """torchvision-graph efficientnet feature extractor (classifier dropped,
    which is how the reference uses it: model_architectures.py:87) —
    submodule nesting produces torchvision's exact state_dict keys
    (features.0.{0,1}, features.{s}.{b}.block.{j}.., features.8.{0,1})."""
    import math

    import torch.nn as tnn

    from underwater_image_enhancement_tpu.models.zoo import (
        _EFFNET_MULTS, _EFFNET_STAGES, _make_divisible)

    width, depth = _EFFNET_MULTS[variant]

    def conv_bn_act(cin, cout, k, s, groups=1, act=True):
        layers = [tnn.Conv2d(cin, cout, k, s, k // 2, groups=groups,
                             bias=False), tnn.BatchNorm2d(cout)]
        if act:
            layers.append(tnn.SiLU())
        return tnn.Sequential(*layers)

    class SE(tnn.Module):
        def __init__(self, exp, sq):
            super().__init__()
            self.fc1 = tnn.Conv2d(exp, sq, 1)
            self.fc2 = tnn.Conv2d(sq, exp, 1)

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            s = torch.sigmoid(self.fc2(torch.nn.functional.silu(self.fc1(s))))
            return x * s

    class MBConvT(tnn.Module):
        def __init__(self, cin, cout, e, k, s):
            super().__init__()
            exp = cin * e
            mods = [] if e == 1 else [conv_bn_act(cin, exp, 1, 1)]
            mods += [conv_bn_act(exp, exp, k, s, groups=exp),
                     SE(exp, max(1, cin // 4)),
                     conv_bn_act(exp, cout, 1, 1, act=False)]
            self.block = tnn.Sequential(*mods)
            self.use_res = s == 1 and cin == cout

        def forward(self, x):
            y = self.block(x)
            return x + y if self.use_res else y

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            cin = _make_divisible(32 * width)
            feats = [conv_bn_act(3, cin, 3, 2)]
            for e, k, s, out, r in _EFFNET_STAGES:
                cout = _make_divisible(out * width)
                blocks = []
                for b in range(int(math.ceil(r * depth))):
                    blocks.append(MBConvT(cin, cout, e, k, s if b == 0 else 1))
                    cin = cout
                feats.append(tnn.Sequential(*blocks))
            feats.append(conv_bn_act(cin, 4 * cin, 1, 1))
            self.features = tnn.Sequential(*feats)

        def forward(self, x):
            return self.features(x).mean((2, 3))

    return Net()


@pytest.mark.parametrize("variant", ["b0", "b3"])
def test_efficientnet_import_matches_torch(variant):
    """Imported torchvision-format efficientnet weights reproduce the torch
    backbone's pooled features (validates the SE fc1/fc2 mapping, depthwise
    group transpose, expand=1 stage-1 layout, and the b3 width/depth
    rounding)."""
    import flax.linen as nn

    from underwater_image_enhancement_tpu.models.zoo import (
        EfficientNetParameterPredictor,
        MBConv,
        SIX_PARAM_RANGES,
        _effnet_blocks,
        load_torch_efficientnet,
    )

    torch.manual_seed(0)
    ref = _torch_efficientnet_modules(variant)
    with torch.no_grad():
        for m in ref.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    model = EfficientNetParameterPredictor(variant=variant)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    imported = load_torch_efficientnet(variables, ref.state_dict(), variant)

    x = np.random.default_rng(1).normal(0, 1, (2, 32, 32, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    stem, blocks, head = _effnet_blocks(variant)

    class Backbone(nn.Module):
        @nn.compact
        def __call__(self, img):  # mirrors the predictor's trunk
            h = nn.Conv(stem, (3, 3), strides=2, padding=1,
                        use_bias=False)(img)
            h = nn.BatchNorm(use_running_average=True)(h)
            h = nn.swish(h)
            for expand, kernel, stride, out_ch in blocks:
                h = MBConv(out_ch, expand, kernel, stride)(h, train=False)
            h = nn.Conv(head, (1, 1), use_bias=False)(h)
            h = nn.BatchNorm(use_running_average=True)(h)
            h = nn.swish(h)
            return jnp.mean(h, axis=(1, 2))

    keep = (["Conv_0", "BatchNorm_0", "Conv_1", "BatchNorm_1"]
            + [f"MBConv_{i}" for i in range(len(blocks))])
    sub = {"params": {k: imported["params"][k] for k in keep},
           "batch_stats": {k: imported["batch_stats"][k] for k in keep
                           if not k.startswith("Conv")}}
    got = np.asarray(Backbone().apply(sub, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=2e-3)

    if variant == "b0":  # the full predictor still runs with the trunk
        out = model.apply(imported, jnp.asarray(x), train=False)
        for name, (lo, hi) in SIX_PARAM_RANGES.items():
            v = np.asarray(out[name])
            assert np.all(v >= lo) and np.all(v <= hi)


def _torch_vit_modules(patch=8, dim=64, depth=2, heads=4, img=32):
    """torchvision-graph vit feature extractor (heads dropped, which is how
    the reference uses it: model_architectures.py:131) — submodule names
    produce torchvision's exact state_dict keys (conv_proj, class_token,
    encoder.layers.encoder_layer_i.{ln_1,self_attention,ln_2,mlp.0,mlp.3},
    encoder.ln)."""
    import collections

    import torch.nn as tnn

    class EncoderLayer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(dim)
            self.self_attention = tnn.MultiheadAttention(
                dim, heads, batch_first=True)
            self.ln_2 = tnn.LayerNorm(dim)
            self.mlp = tnn.Sequential(
                tnn.Linear(dim, dim * 4), tnn.GELU(), tnn.Dropout(0.0),
                tnn.Linear(dim * 4, dim), tnn.Dropout(0.0))

        def forward(self, x):
            y = self.ln_1(x)
            a, _ = self.self_attention(y, y, y, need_weights=False)
            x = x + a
            return x + self.mlp(self.ln_2(x))

    class Encoder(tnn.Module):
        def __init__(self, seq):
            super().__init__()
            self.pos_embedding = tnn.Parameter(
                torch.randn(1, seq, dim) * 0.02)
            self.layers = tnn.Sequential(collections.OrderedDict(
                (f"encoder_layer_{i}", EncoderLayer())
                for i in range(depth)))
            self.ln = tnn.LayerNorm(dim)

        def forward(self, x):
            return self.ln(self.layers(x + self.pos_embedding))

    class ViT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_proj = tnn.Conv2d(3, dim, patch, patch)
            self.class_token = tnn.Parameter(torch.zeros(1, 1, dim))
            self.encoder = Encoder(1 + (img // patch) ** 2)

        def forward(self, x):
            B = x.shape[0]
            x = self.conv_proj(x)                    # (B, dim, h, w)
            x = x.flatten(2).transpose(1, 2)         # (B, hw, dim)
            cls = self.class_token.expand(B, -1, -1)
            x = torch.cat([cls, x], dim=1)
            return self.encoder(x)[:, 0]             # CLS features

    return ViT()


def test_vit_import_matches_torch():
    """Imported torchvision-format ViT weights reproduce the torch
    backbone's CLS features (validates the packed-qkv split, head-major
    DenseGeneral reshapes, patch-embed transpose, pos/cls mapping, and the
    exact-GELU convention)."""
    import flax.linen as nn

    from underwater_image_enhancement_tpu.models.zoo import (
        SIX_PARAM_RANGES,
        ViTParameterPredictor,
        load_torch_vit,
    )

    torch.manual_seed(0)
    ref = _torch_vit_modules()
    with torch.no_grad():
        ref.class_token.normal_(0, 0.5)  # move off zeros to exercise the map
    ref.eval()

    model = ViTParameterPredictor(patch=8, dim=64, depth=2, heads=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    imported = load_torch_vit(variables, ref.state_dict())

    x = np.random.default_rng(1).normal(0, 1, (2, 32, 32, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    class Backbone(nn.Module):
        @nn.compact
        def __call__(self, img):  # mirrors ViTParameterPredictor's trunk
            B = img.shape[0]
            x = nn.Conv(64, (8, 8), strides=(8, 8))(img)
            x = x.reshape(B, -1, 64)
            cls = self.param("cls", nn.initializers.zeros, (1, 1, 64))
            x = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), x], axis=1)
            pos = self.param("pos", nn.initializers.zeros, (1, x.shape[1], 64))
            x = x + pos
            for _ in range(2):
                y = nn.LayerNorm()(x)
                y = nn.MultiHeadDotProductAttention(num_heads=4)(y, y)
                x = x + y
                y = nn.LayerNorm()(x)
                y = nn.Dense(64 * 4)(y)
                y = nn.gelu(y, approximate=False)
                y = nn.Dense(64)(y)
                x = x + y
            return nn.LayerNorm()(x)[:, 0]

    keep = (["Conv_0", "cls", "pos"]
            + [f"LayerNorm_{i}" for i in range(5)]
            + [f"MultiHeadDotProductAttention_{i}" for i in range(2)]
            + [f"Dense_{i}" for i in range(4)])
    sub = {"params": {k: imported["params"][k] for k in keep}}
    got = np.asarray(Backbone().apply(sub, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    # the full predictor still runs with the imported trunk
    out = model.apply(imported, jnp.asarray(x), train=False)
    for name, (lo, hi) in SIX_PARAM_RANGES.items():
        v = np.asarray(out[name])
        assert np.all(v >= lo) and np.all(v <= hi)

    # wrong-image-size artifact fails fast with a clear message
    small = ViTParameterPredictor(patch=8, dim=64, depth=2, heads=4)
    vars16 = small.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    with pytest.raises(ValueError, match="pos embedding"):
        load_torch_vit(vars16, ref.state_dict())


def test_zoo_trainer_end_to_end(tmp_path):
    """ZooTrainer: 2 epochs on synthetic pairs — loss finite, params move,
    checkpoint round-trips (the trainer wiring the reference lacks)."""
    from underwater_image_enhancement_tpu.train.trainer import ZooTrainer

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0.1, 0.9, (4, 32, 32, 3)).astype(np.float32)
    refs = np.clip(imgs * 1.2, 0, 1).astype(np.float32)

    tr = ZooTrainer(model_type="resnet", image_size=32, pretrained=None,
                    lr=1e-3)
    before = np.asarray(
        jax.tree_util.tree_leaves(tr.params)[0]).copy()
    batches = lambda: iter([(imgs[:2], refs[:2]), (imgs[2:], refs[2:])])
    hist = tr.fit(batches, batches, epochs=2, output_folder=str(tmp_path),
                  log=lambda *a: None)
    assert len(hist["train_loss"]) == 2
    assert np.isfinite(hist["train_loss"]).all()
    after = np.asarray(jax.tree_util.tree_leaves(tr.params)[0])
    assert not np.array_equal(before, after)

    tr2 = ZooTrainer(model_type="resnet", image_size=32, pretrained=None)
    tr2.load(str(tmp_path / "best_model"))
    p = tr2.predict_params(jnp.asarray(imgs))
    assert np.isfinite(np.asarray(p["omega"])).all()


@pytest.mark.parametrize("model_type,variant,loader,artifact", [
    ("resnet", "b0", "load_resnet18_npz", "resnet18"),
    ("efficientnet", "b3", "load_efficientnet_npz", "efficientnet_b3"),
    ("vit", "b0", "load_vit_npz", "vit_b_16"),
])
def test_zoo_trainer_pretrained_dispatch(tmp_path, monkeypatch, model_type,
                                         variant, loader, artifact):
    """ZooTrainer routes a pretrained .npz to the right backbone loader for
    ALL THREE trunks (round-3 raised for anything but resnet), and 'auto'
    discovery resolves the conventional artifact name per model_type."""
    from underwater_image_enhancement_tpu.models import zoo
    from underwater_image_enhancement_tpu.train.trainer import ZooTrainer
    from underwater_image_enhancement_tpu.utils.weights import find_zoo_npz

    calls = []

    def fake_loader(variables, path, *a):
        calls.append((path,) + a)
        return variables

    monkeypatch.setattr(zoo, loader, fake_loader)
    # small image size keeps init cheap; the load dispatch is what's gated
    tr = ZooTrainer(model_type=model_type, variant=variant, image_size=32,
                    pretrained="/tmp/fake.npz")
    assert calls and calls[0][0] == "/tmp/fake.npz"
    if model_type == "efficientnet":
        assert calls[0][1] == variant
    assert tr.model_type == model_type

    # auto-discovery resolves the conventional per-backbone artifact name
    wdir = tmp_path / "w"
    wdir.mkdir()
    np.savez(wdir / f"{artifact}.npz", dummy=np.zeros(1))
    monkeypatch.setenv("UIE_TPU_WEIGHTS", str(wdir))
    assert find_zoo_npz(model_type, variant) == str(wdir / f"{artifact}.npz")


def test_zoo_predictor_roundtrip(tmp_path):
    """ZooPredictor loads a ZooTrainer checkpoint and agrees with the
    trainer's own predict_params under the SAME preprocessing (both
    ImageNet-normalize the backbone input); enhance_image applies the
    six-param composite at full resolution with clamped params."""
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.models.predictor import (
        CLAMPS,
        ZooPredictor,
    )
    from underwater_image_enhancement_tpu.train.trainer import ZooTrainer

    rng = np.random.default_rng(1)
    imgs = (rng.integers(0, 256, (4, 32, 32, 3)).astype(np.float32) / 255.0)
    refs = np.clip(imgs * 1.2, 0, 1).astype(np.float32)
    tr = ZooTrainer(model_type="resnet", image_size=32, pretrained=None,
                    lr=1e-3)
    batches = lambda: iter([(imgs[:2], refs[:2]), (imgs[2:], refs[2:])])
    tr.fit(batches, batches, epochs=1, output_folder=str(tmp_path),
           log=lambda *a: None)

    pred = ZooPredictor(checkpoint_path=str(tmp_path / "final_model"),
                        model_type="resnet", input_size=32)
    img = imgs[0]
    # same-preprocessing agreement: the predictor's clamped params equal the
    # trainer's raw head outputs (head ranges sit inside the clamps)
    want = {k: float(np.asarray(v).reshape(-1)[0])
            for k, v in tr.predict_params(jnp.asarray(img)[None]).items()}
    got = pred.predict_parameters(jnp.asarray(img))
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, atol=1e-4, err_msg=k)
    assert set(CLAMPS) <= set(got)

    # full-res apply: bigger frame than the 32^2 prediction resolution
    big = (rng.integers(0, 256, (48, 64, 3)).astype(np.float32) / 255.0)
    out = pred.enhance_image(jnp.asarray(big))
    assert out.shape == big.shape
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1


def test_weights_autodiscovery(tmp_path, monkeypatch):
    """$UIE_TPU_WEIGHTS/vgg16.npz is picked up by VGGTrainer by default
    (VERDICT r2 item 4): backbone trunk filled, no random-trunk warning."""
    import warnings

    from underwater_image_enhancement_tpu.models.vgg import TORCH_CONV_IDX
    from underwater_image_enhancement_tpu.train.trainer import VGGTrainer
    from underwater_image_enhancement_tpu.utils.weights import find_vgg16_npz

    gen = np.random.default_rng(0)
    plan = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512]
    state, in_ch = {}, 3
    for ti, out_ch in zip(TORCH_CONV_IDX, plan):
        state[f"{ti}.weight"] = gen.normal(
            0, 0.05, (out_ch, in_ch, 3, 3)).astype(np.float32)
        state[f"{ti}.bias"] = gen.normal(0, 0.05, (out_ch,)).astype(
            np.float32)
        in_ch = out_ch
    wdir = tmp_path / "weights"
    wdir.mkdir()
    np.savez(wdir / "vgg16.npz", **state)
    monkeypatch.setenv("UIE_TPU_WEIGHTS", str(wdir))

    assert find_vgg16_npz() == str(wdir / "vgg16.npz")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the random-trunk warning must NOT fire
        t = VGGTrainer(hidden_dim=16, image_size=32, epochs=4)
    np.testing.assert_allclose(
        np.asarray(t.params["vgg"]["conv0"]["kernel"]),
        state["0.weight"].transpose(2, 3, 1, 0), atol=0)

    # absent artifact -> explicit None search result
    monkeypatch.setenv("UIE_TPU_WEIGHTS", str(tmp_path / "empty"))
    monkeypatch.setenv("HOME", str(tmp_path / "nohome"))
    assert find_vgg16_npz() is None


@pytest.mark.skipif(
    __import__("underwater_image_enhancement_tpu.utils.weights",
               fromlist=["find_vgg16_npz"]).find_vgg16_npz() is None,
    reason="no real vgg16.npz artifact installed "
           "(run tools/fetch_vgg16_npz.py on an online box)")
def test_real_vgg16_artifact_integration():
    """When a real converted ImageNet VGG16 artifact is installed, the
    predictor auto-loads it and produces finite in-range parameters."""
    from underwater_image_enhancement_tpu.models.predictor import (
        EnhancementPredictor,
    )

    pred = EnhancementPredictor()
    img = np.random.default_rng(0).uniform(
        0.05, 0.95, (120, 160, 3)).astype(np.float32)
    params = pred.predict_parameters(img)
    for k, v in params.items():
        assert np.isfinite(v)
