"""LR schedule golden parity against the reference adjust_learning_rate,
plus optimizer grouping / EMA behavior."""

import importlib.util
from types import SimpleNamespace

import jax
import numpy as np
import pytest

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.train.optim import current_lrs, ema_update, schedule_gammas

# fast confidence subset for the 1-core box (VERDICT r2 weak #7)
pytestmark = pytest.mark.quick



@pytest.fixture(scope="module")
def ref_optim():
    pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_optim", "/root/reference/util/optim.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class FakeOptimizer:
    def __init__(self):
        self.param_groups = [{"lr": 0.0}, {"lr": 0.0}, {"lr": 0.0}]


@pytest.mark.parametrize(
    "schedule", ["step", "multistep", "linear_with_warmup", "all_linear_with_warmup"]
)
def test_schedules_match_reference(ref_optim, schedule):
    cfg = TubeDETRConfig(
        schedule=schedule,
        lr=5e-5,
        lr_backbone=1e-5,
        text_encoder_lr=3e-5,
        lr_drop=10,
        epochs=25,
        fraction_warmup_steps=0.01,
    )
    args = SimpleNamespace(
        schedule=schedule,
        lr=cfg.lr,
        lr_backbone=cfg.lr_backbone,
        text_encoder_lr=cfg.text_encoder_lr,
        lr_drop=cfg.lr_drop,
        epochs=cfg.epochs,
        fraction_warmup_steps=cfg.fraction_warmup_steps,
    )
    num_steps = 1000
    opt = FakeOptimizer()
    for epoch in (0, 5, 10, 12, 24):
        for step in (0, 3, 10, 500, 999):
            ref_optim.adjust_learning_rate(opt, epoch, step, num_steps, args)
            ours = current_lrs(cfg, epoch, step, num_steps)
            np.testing.assert_allclose(
                [ours["lr"], ours["lr_backbone"], ours["lr_text_encoder"]],
                [g["lr"] for g in opt.param_groups],
                rtol=1e-9,
                err_msg=f"{schedule} e{epoch} s{step}",
            )


def test_ema_update_formula():
    import jax.numpy as jnp

    ema = {"a": jnp.array([1.0, 2.0])}
    new = {"a": jnp.array([3.0, 4.0])}
    out = ema_update(ema, new, 0.9)
    np.testing.assert_allclose(
        np.asarray(out["a"]), [1.0 * 0.9 + 0.3, 2.0 * 0.9 + 0.4], atol=1e-7
    )


def test_param_labels_freeze_rules():
    from tubedetr_tpu.train.optim import label_params

    params = {
        "backbone": {
            "conv1": {"kernel": 0},
            "bn1": {"scale": 0},
            "layer1_0": {"conv1": {"kernel": 0}},
            "layer2_0": {"conv1": {"kernel": 0}},
            "layer4_2": {"conv3": {"kernel": 0}},
        },
        "text_encoder": {"layer_0": {"intermediate": {"kernel": 0}}},
        "transformer": {"encoder": {"layer_0": {"linear1": {"kernel": 0}}}},
        "query_embed": 0,
    }
    cfg = TubeDETRConfig(lr_backbone=1e-5, freeze_text_encoder=False)
    labels = label_params(params, cfg)
    assert labels["backbone"]["conv1"]["kernel"] == "frozen"
    assert labels["backbone"]["layer1_0"]["conv1"]["kernel"] == "frozen"
    assert labels["backbone"]["layer2_0"]["conv1"]["kernel"] == "backbone"
    assert labels["backbone"]["layer4_2"]["conv3"]["kernel"] == "backbone"
    assert labels["text_encoder"]["layer_0"]["intermediate"]["kernel"] == "text"
    assert labels["transformer"]["encoder"]["layer_0"]["linear1"]["kernel"] == "main"
    assert labels["query_embed"] == "main"

    cfg2 = TubeDETRConfig(lr_backbone=0, freeze_text_encoder=True)
    labels2 = label_params(params, cfg2)
    assert labels2["backbone"]["layer2_0"]["conv1"]["kernel"] == "frozen"
    assert labels2["text_encoder"]["layer_0"]["intermediate"]["kernel"] == "frozen"


def test_mask_frozen_grads_excludes_frozen_from_clip_norm():
    """Frozen params carry no .grad in the reference, so
    torch.nn.utils.clip_grad_norm_ never counts them; our mask must zero
    exactly the frozen leaves BEFORE the optax global-norm clip sees them."""
    from tubedetr_tpu.train.optim import label_params, mask_frozen_grads

    params = {
        "backbone": {
            "conv1": {"kernel": np.ones(4, np.float32)},
            "layer1_0": {"conv1": {"kernel": np.ones(4, np.float32)}},
            "layer2_0": {"conv1": {"kernel": np.ones(4, np.float32)}},
        },
        "text_encoder": {"emb": np.ones(4, np.float32)},
        "transformer": {"w": np.ones(4, np.float32)},
    }
    cfg = TubeDETRConfig(lr_backbone=1e-5, freeze_text_encoder=True)
    labels = label_params(params, cfg)
    grads = jax.tree_util.tree_map(lambda p: p * 3.0, params)
    masked = mask_frozen_grads(grads, labels)
    assert np.all(masked["backbone"]["conv1"]["kernel"] == 0)
    assert np.all(masked["backbone"]["layer1_0"]["conv1"]["kernel"] == 0)
    assert np.all(masked["text_encoder"]["emb"] == 0)  # frozen text encoder
    assert np.all(masked["backbone"]["layer2_0"]["conv1"]["kernel"] == 3.0)
    assert np.all(masked["transformer"]["w"] == 3.0)
    # the resulting global norm is exactly the norm over trainable leaves
    norm = float(
        np.sqrt(sum(np.sum(np.square(g))
                    for g in jax.tree_util.tree_leaves(masked)))
    )
    assert abs(norm - np.sqrt(2 * np.sum(np.square(np.full(4, 3.0))))) < 1e-6


def test_adamw_unit_lr_scaling_matches_torch_adamw():
    """Our unit-LR adamw + post-scale must match torch.optim.AdamW for a few
    steps on a toy parameter."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    import optax

    from tubedetr_tpu.train.optim import scale_updates_by_lr

    lr, wd = 1e-2, 1e-1
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array(g, np.float32) for g in ([0.1, -0.2, 0.3], [0.05, 0.1, -0.1])]

    # torch
    wt = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.AdamW([wt], lr=lr, weight_decay=wd, eps=1e-8)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()

    # ours
    tx = optax.adamw(1.0, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    params = {"p": jnp.asarray(w0)}
    st = tx.init(params)
    labels = {"p": "main"}
    for g in grads:
        upd, st = tx.update({"p": jnp.asarray(g)}, st, params)
        upd = scale_updates_by_lr(upd, labels, {"lr": lr, "lr_backbone": 0, "lr_text_encoder": 0})
        params = {"p": params["p"] + upd["p"]}
    np.testing.assert_allclose(
        np.asarray(params["p"]), wt.detach().numpy(), atol=1e-6
    )
