"""Scanned stage tails: numerics identical to the unrolled loop, and the
converter's stacked layout matches the scan parameter tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tubedetr_tpu.models.resnet import ResNet


def test_scan_matches_unrolled():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32))
    scanned = ResNet(arch="resnet26", scan_blocks=True)
    unrolled = ResNet(arch="resnet26", scan_blocks=False)
    vs = scanned.init(jax.random.PRNGKey(0), x)
    vu = unrolled.init(jax.random.PRNGKey(0), x)

    # map the unrolled tree into the scanned layout: block i>=1 of each
    # stage stacks under layer{i}_rest/block
    def to_scanned(tree):
        import re

        out = {}
        for k, v in tree.items():
            m = re.match(r"layer(\d+)_(\d+)$", k)
            if m and int(m.group(2)) >= 1:
                continue  # tail blocks fold into the stacked rest entry
            out[k] = v
        for li in range(1, 5):
            tail = [
                tree[f"layer{li}_{bi}"]
                for bi in range(1, 10)
                if f"layer{li}_{bi}" in tree
            ]
            if tail:
                out[f"layer{li}_rest"] = {
                    "block": jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs, 0), *tail
                    )
                }
        return out

    vs2 = {
        "params": to_scanned(vu["params"]),
        "buffers": to_scanned(vu["buffers"]),
    }
    # randomise the unrolled weights a bit so the check is non-trivial
    out_u = unrolled.apply(vu, x)
    out_s = scanned.apply(vs2, x)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u), atol=2e-5)
    # tree structures agree between scan init and converted stacking
    js = jax.tree_util.tree_structure(vs)
    js2 = jax.tree_util.tree_structure(vs2)
    assert js == js2


def test_converter_stacks_tail_blocks():
    torch = pytest.importorskip("torch")
    from tubedetr_tpu.interop.torch_convert import convert_resnet

    rng = np.random.RandomState(0)
    sd = {}

    def add_block(prefix, cin, planes, downsample):
        t = lambda *s: torch.from_numpy(rng.randn(*s).astype(np.float32))
        sd[f"{prefix}.conv1.weight"] = t(planes, cin, 1, 1)
        sd[f"{prefix}.conv2.weight"] = t(planes, planes, 3, 3)
        sd[f"{prefix}.conv3.weight"] = t(planes * 4, planes, 1, 1)
        for bn in ("bn1", "bn2", "bn3"):
            n = planes * 4 if bn == "bn3" else planes
            for k in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{prefix}.{bn}.{k}"] = t(n)
        if downsample:
            sd[f"{prefix}.downsample.0.weight"] = t(planes * 4, cin, 1, 1)
            for k in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{prefix}.downsample.1.{k}"] = t(planes * 4)

    t = lambda *s: torch.from_numpy(rng.randn(*s).astype(np.float32))
    sd["conv1.weight"] = t(64, 3, 7, 7)
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{k}"] = t(64)
    add_block("layer1.0", 64, 16, True)
    add_block("layer1.1", 64, 16, False)
    add_block("layer1.2", 64, 16, False)

    params, buffers = convert_resnet(sd, "", scan_blocks=True)
    assert "layer1_0" in params and "layer1_rest" in params
    blk = params["layer1_rest"]["block"]
    assert blk["conv1"]["kernel"].shape == (2, 1, 1, 64, 16)
    np.testing.assert_allclose(
        blk["conv1"]["kernel"][1],
        sd["layer1.2.conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    assert buffers["layer1_rest"]["block"]["bn2"]["running_var"].shape == (2, 16)


def test_stages_truncation_matches_full_prefix():
    """ResNet.stages (profiling aid) must not disturb the default forward
    and must accept the full param tree at any truncation."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from tubedetr_tpu.models.resnet import ResNet

    x = jnp.asarray(
        np.random.RandomState(0).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    full = ResNet(arch="resnet14", dilation=True)
    variables = full.init(jax.random.PRNGKey(0), x)
    y_default = full.apply(variables, x)
    y_stages4 = ResNet(arch="resnet14", dilation=True, stages=4).apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y_default), np.asarray(y_stages4))

    expected_channels = {0: 64, 1: 256, 2: 512, 3: 1024, 4: 2048}
    for s, c in expected_channels.items():
        y = ResNet(arch="resnet14", dilation=True, stages=s).apply(variables, x)
        assert y.shape[-1] == c, (s, y.shape)


def test_remat_policy_numerics_identical():
    """remat_policy is a memory/recompute trade ONLY: forward outputs and
    gradients must be bit-comparable across full/save_mid/save_acts (and vs
    remat off). Covers the checkpoint_name residuals in Bottleneck and the
    ScanStage remat_policy threading (ADVICE r4 #1 wiring)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from tubedetr_tpu.models.resnet import ResNet

    x = jnp.asarray(
        np.random.RandomState(1).standard_normal((2, 32, 32, 3)), jnp.float32
    )

    def run(remat, policy):
        model = ResNet(arch="resnet14", remat=remat, remat_policy=policy)
        variables = model.init(jax.random.PRNGKey(0), x)

        def loss(params):
            y = model.apply({**variables, "params": params}, x)
            return jnp.sum(y**2)

        val, grads = jax.value_and_grad(loss)(variables["params"])
        return val, grads

    ref_val, ref_grads = run(False, "full")
    for policy in ("full", "save_mid", "save_acts"):
        val, grads = run(True, policy)
        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            ),
            grads,
            ref_grads,
        )


def test_remat_policy_via_config():
    """TubeDETRConfig.remat_policy reaches the backbone (plumbing test) and
    validate() rejects unknown policies."""
    import pytest

    from tubedetr_tpu.config import TubeDETRConfig
    from tubedetr_tpu.models.tubedetr import TubeDETR

    import tubedetr_tpu.models.tubedetr as tubedetr_mod

    cfg = TubeDETRConfig(backbone="resnet14", remat_policy="save_mid").validate()
    seen = {}
    real_resnet = tubedetr_mod.ResNet

    class _Probe(Exception):
        pass

    def spy(**kwargs):
        seen.update(kwargs)
        raise _Probe()

    tubedetr_mod.ResNet = spy
    try:
        with pytest.raises(_Probe):
            # bind() runs setup(), which constructs the backbone
            TubeDETR(cfg).bind({"params": {}}).backbone  # noqa: B018
    finally:
        tubedetr_mod.ResNet = real_resnet
    assert seen.get("remat_policy") == "save_mid"
    with pytest.raises(AssertionError):
        TubeDETRConfig(backbone="resnet14", remat_policy="bogus").validate()
