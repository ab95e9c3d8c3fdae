"""Numerical cross-validation against the REAL torch reference architecture.

Every other parity test compares rxtpu to rxtpu or to hand-math; this file
executes the reference network itself. ``_TorchTwoSitesNN`` is a test-local
``torch.nn`` transcription of ``/root/reference/cell_classifier/models.py:7-57``
(torchvision is not installed in this image, so the resnet50 blocks are
inlined exactly as ``torchvision.models.resnet`` builds them). Both
frameworks load the SAME synthetic torch-format state_dict through their
respective loaders — torch via ``load_state_dict`` + the models.py:24-26
stem rule, rxtpu via ``rxtpu.models.pretrained.port_torch_resnet50`` — and
must then agree, in float32, on:

- the eval-mode forward (pins conv padding/stride placement, BN
  eps/running-stat use, pooling geometry, head ordering, stem rule);
- the train-mode forward (pins batch-statistic computation);
- the BatchNorm running statistics after a train step (pins torch's
  UNBIASED running_var — Bessel n/(n-1) — vs biased batch normalization,
  see rxtpu.models.norm);
- one full SGD(momentum=0.9, nesterov, wd=3e-5) parameter update
  (``main.py:89-93``) computed through rxtpu's actual optimizer path.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rxtpu.models.pretrained import (  # noqa: E402
    port_torch_resnet50,
    stem_kernel_from_rgb,
    synthetic_resnet50_state_dict,
)
from rxtpu.models.twosites import TwoSitesNN  # noqa: E402

NB_CLASSES = 8
H = W = 64
# B=8: train-mode parity needs the batch dimension to carry real statistics
# — the head's BatchNorm1d normalizes over B samples, and at B=2 it divides
# by the per-feature |x0-x1|/2, amplifying float noise unboundedly.
B, G = 8, 3


# ---------------------------------------------------------------------------
# torch mirror of /root/reference/cell_classifier/models.py:7-57
# (resnet50 inlined from torchvision.models.resnet: Bottleneck expansion 4,
# stride on conv2 — the torchvision "v1.5" placement)
# ---------------------------------------------------------------------------

class _Bottleneck(torch.nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet50(torch.nn.Module):
    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)
        self.layer4 = self._make_layer(512, 3, stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * 4, 1000)

    def _make_layer(self, planes, blocks, stride=1):
        nn = torch.nn
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x)
        x = torch.flatten(x, 1)
        return self.fc(x)


class _TorchTwoSitesNN(torch.nn.Module):
    """models.py:7-57, verbatim structure (dropout as a constructor arg)."""

    def __init__(self, sd, nb_classes, size_features=1024, dropout=0.3):
        super().__init__()
        nn = torch.nn
        self.base_nn = _ResNet50()
        self.base_nn.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
        )
        # models.py:17-27 — 6-channel stem from mean-over-RGB of conv1
        trained_kernel = self.base_nn.conv1.weight
        new_conv = nn.Conv2d(6, 64, 7, stride=2, padding=3, bias=False)
        with torch.no_grad():
            temp = [torch.mean(trained_kernel, 1)] * 6
            new_conv.weight[:, :] = torch.stack(temp, dim=1)
        self.base_nn.conv1 = new_conv
        num_ftrs_cnn = 3 * self.base_nn.fc.in_features
        self.base_nn.fc = nn.Identity()
        self.mlp = nn.Sequential(
            nn.BatchNorm1d(num_ftrs_cnn),
            nn.Dropout(dropout),
            nn.Linear(num_ftrs_cnn, size_features),
            nn.ReLU(),
            nn.BatchNorm1d(size_features),
            nn.Dropout(dropout),
            nn.Linear(size_features, nb_classes),
        )

    def forward(self, x):  # x: [bs, 3, C, H, W]
        bs = x.shape[0]
        x = x.reshape([-1, x.shape[2], x.shape[3], x.shape[4]])
        features = self.base_nn(x)
        features = features.reshape([bs, -1, features.shape[1]])
        shape = int(features.shape[1] / 3)
        f_imgs = features[:, 0:shape, :].mean(1)
        f_neg = features[:, shape:2 * shape, :].mean(1)
        f_pos = features[:, 2 * shape:, :].mean(1)
        return self.mlp(torch.cat([f_imgs, f_neg, f_pos], dim=1))


def _copy_head_to_torch(tmodel, params, batch_stats, dtype=np.float32):
    """Give both frameworks identical (flax-initialized) head weights."""
    hp, hs = params["head"], batch_stats["head"]
    t = lambda a: torch.from_numpy(np.asarray(a, dtype))  # noqa: E731
    with torch.no_grad():
        for torch_bn, name in ((tmodel.mlp[0], "bn1"), (tmodel.mlp[4], "bn2")):
            torch_bn.weight.copy_(t(hp[name]["scale"]))
            torch_bn.bias.copy_(t(hp[name]["bias"]))
            torch_bn.running_mean.copy_(t(hs[name]["mean"]))
            torch_bn.running_var.copy_(t(hs[name]["var"]))
        for torch_fc, name in ((tmodel.mlp[2], "fc1"), (tmodel.mlp[6], "fc2")):
            torch_fc.weight.copy_(t(hp[name]["kernel"]).T.contiguous())
            torch_fc.bias.copy_(t(hp[name]["bias"]))


def _build_pair(dropout=0.3, seed=0):
    sd = synthetic_resnet50_state_dict(seed=seed)
    model = TwoSitesNN(
        backbone="resnet50", nb_classes=NB_CLASSES, dropout=dropout,
        dtype=jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, G, H, W, 6), jnp.float32),
        train=False,
    )
    params, batch_stats = port_torch_resnet50(
        sd, variables["params"], variables["batch_stats"]
    )
    tmodel = _TorchTwoSitesNN(sd, NB_CLASSES, dropout=dropout)
    _copy_head_to_torch(tmodel, params, batch_stats)
    return model, params, batch_stats, tmodel


def _inputs(seed=2):
    rng = np.random.default_rng(seed)
    x = rng.normal(0.0, 1.0, size=(B, G, 6, H, W)).astype(np.float32)
    y = rng.integers(0, NB_CLASSES, size=(B,)).astype(np.int64)
    return x, y


def test_stem_rule_matches_torch():
    """models.py:24-26 executed in torch vs stem_kernel_from_rgb."""
    sd = synthetic_resnet50_state_dict(seed=3)
    trained = torch.from_numpy(sd["conv1.weight"])
    temp = [torch.mean(trained, 1)] * 6
    torch_stem = torch.stack(temp, dim=1).numpy()          # [64, 6, 7, 7]
    ours = stem_kernel_from_rgb(
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), 6  # HWIO
    )
    np.testing.assert_allclose(
        np.transpose(torch_stem, (2, 3, 1, 0)), ours, atol=1e-7
    )


def test_single_batchnorm_train_parity():
    """One rxtpu BatchNorm == one torch BatchNorm2d, tightly (train mode).

    The full-net train test below needs a loose tolerance because deep
    train-mode BN is chaotically sensitive; this pins the module itself —
    output, running_mean, and the UNBIASED running_var — at float rounding.
    """
    from rxtpu.models.norm import BatchNorm

    rng = np.random.default_rng(7)
    xt = rng.normal(1.5, 2.0, size=(4, 16, 9, 11)).astype(np.float32)  # NCHW
    tbn = torch.nn.BatchNorm2d(16, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(
            rng.normal(1, 0.3, 16).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(
            rng.normal(0, 0.3, 16).astype(np.float32)))
        tbn.running_mean.copy_(torch.from_numpy(
            rng.normal(0, 1, 16).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(
            np.abs(rng.normal(1, 0.3, 16)).astype(np.float32)))
    # .copy(): jnp.asarray zero-copy-aliases CPU numpy views, and torch
    # updates running stats IN PLACE during the forward below
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy().copy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy().copy())},
        "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy().copy()),
                        "var": jnp.asarray(tbn.running_var.numpy().copy())},
    }
    tbn.train()
    yt = tbn(torch.from_numpy(xt)).detach().numpy()

    bn = BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                   dtype=jnp.float32)
    yj, mutated = bn.apply(
        variables, jnp.asarray(np.transpose(xt, (0, 2, 3, 1))),
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(yj), (0, 3, 1, 2)), yt, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-5)

    # eval mode too (folded-affine application path)
    tbn.eval()
    with torch.no_grad():
        yt_e = tbn(torch.from_numpy(xt)).numpy()
    bn_e = BatchNorm(use_running_average=True, epsilon=1e-5, dtype=jnp.float32)
    yj_e = bn_e.apply(
        {"params": variables["params"],
         "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                         "var": jnp.asarray(tbn.running_var.numpy())}},
        jnp.asarray(np.transpose(xt, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(yj_e), (0, 3, 1, 2)), yt_e, atol=1e-5)


def test_batchnorm_f64_input_keeps_f32_stats():
    """An f64 probe input must not flip the stored batch_stats to f64.

    The f64 path (dev/parity_gradcheck.py --f64) computes stats in f64 but
    stores back at the leaves' own dtype, so jitted applies don't retrace
    and checkpoints keep round-tripping against f32-initialized trees."""
    from rxtpu.models.norm import BatchNorm

    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        bn = BatchNorm(use_running_average=False, momentum=0.9,
                       dtype=jnp.float64)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(4, 5, 3)), jnp.float64)
        variables = bn.init(jax.random.PRNGKey(0), x)
        assert variables["batch_stats"]["mean"].dtype == jnp.float32
        y, mutated = bn.apply(x=x, mutable=["batch_stats"],
                              variables=variables)
        assert y.dtype == jnp.float64
        assert mutated["batch_stats"]["mean"].dtype == jnp.float32
        assert mutated["batch_stats"]["var"].dtype == jnp.float32
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


def test_torch_forward_parity_eval():
    """Eval-mode logits agree with the real torch architecture (f32)."""
    model, params, batch_stats, tmodel = _build_pair()
    x, _ = _inputs()

    tmodel.eval()
    with torch.no_grad():
        torch_logits = tmodel(torch.from_numpy(x)).numpy()

    flax_logits = np.asarray(
        jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))),  # NCHW -> NHWC
        )
    )
    scale = np.abs(torch_logits).max()
    assert scale > 1e-3  # a degenerate all-zero forward would pass trivially
    np.testing.assert_allclose(flax_logits, torch_logits, atol=1e-4 * max(1.0, scale))


def test_torch_forward_parity_train_and_running_stats():
    """Train-mode logits + post-step BN running stats agree (dropout=0)."""
    model, params, batch_stats, tmodel = _build_pair(dropout=0.0)
    x, _ = _inputs()

    tmodel.train()
    torch_logits = tmodel(torch.from_numpy(x)).detach().numpy()

    flax_logits, mutated = jax.jit(
        lambda v, xx: model.apply(
            v, xx, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
    )(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))),
    )
    # Train-mode forward is chaotically sensitive: every BN divides by the
    # BATCH std, so implementation-order float noise (measured ~1e-6 rel for
    # a single BN) compounds ~1.5x per block across 16 blocks + the head
    # (measured ~2e-3 rel total; torch-vs-torch reduction-order variation
    # behaves the same). 1e-2*scale still catches every structural defect
    # this file pins — padding misalignment, stride placement, stat
    # formulas, Bessel factor — which all produce O(0.1..1) divergence.
    scale = np.abs(torch_logits).max()
    np.testing.assert_allclose(
        np.asarray(flax_logits), torch_logits, atol=1e-2 * max(1.0, scale)
    )

    new_stats = mutated["batch_stats"]
    # head BatchNorm1d sees [B, 3F] -> n = B = 8: torch's unbiased
    # running_var differs from the biased batch var by 8/7 (~14%), far
    # outside rtol 1e-3 — this pins the Bessel correction
    # (rxtpu.models.norm.BatchNorm) against the real torch module.
    np.testing.assert_allclose(
        np.asarray(new_stats["head"]["bn1"]["var"]),
        tmodel.mlp[0].running_var.detach().numpy(),
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(new_stats["head"]["bn1"]["mean"]),
        tmodel.mlp[0].running_mean.detach().numpy(),
        rtol=1e-3, atol=1e-5,
    )
    # a backbone BN (2d, n = B*G*h*w)
    np.testing.assert_allclose(
        np.asarray(new_stats["backbone"]["bn_init"]["var"]),
        tmodel.base_nn.bn1.running_var.detach().numpy(),
        rtol=1e-4,
    )


def test_torch_train_mode_loss_parity():
    """Train-mode CE loss agrees (statistically tight — batch-stat chaos
    bounds it at ~1e-3 rel, see test_torch_forward_parity_train)."""
    from rxtpu.train.step import cross_entropy

    model, params, batch_stats, tmodel = _build_pair(dropout=0.0)
    x, y = _inputs()
    tmodel.train()
    loss_t = torch.nn.CrossEntropyLoss()(
        tmodel(torch.from_numpy(x)), torch.from_numpy(y)
    ).detach()

    def loss_fn(p):
        logits, _ = model.apply(
            {"params": p, "batch_stats": batch_stats},
            jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))), train=True,
            rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
        )
        return cross_entropy(logits, jnp.asarray(y.astype(np.int32)))

    loss_j = jax.jit(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=5e-3)


def test_torch_f64_train_gradient_parity():
    """Train-mode loss AND every gradient leaf agree at f64 precision.

    The f32 train-mode tests need loose tolerances because deep BN
    backprop chaotically amplifies round-off between equally-correct
    implementations; in float64 end-to-end the two frameworks must agree
    essentially exactly (dev/parity_gradcheck.py --f64 measures <=6e-12
    over a real trajectory). This is the strongest semantic pin: batch
    stats, the fast-variance formulation, CE, and every adjoint."""
    import os
    import sys

    pytest.importorskip("cv2")  # dev/parity_run imports it at module scope
    dev_dir = os.path.join(os.path.dirname(__file__), "..", "dev")
    if dev_dir not in sys.path:
        sys.path.insert(0, dev_dir)
    from parity_run import torch_model_from_flax

    from rxtpu.train.step import cross_entropy

    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        model = TwoSitesNN(backbone="resnet50", nb_classes=NB_CLASSES,
                           dropout=0.0, dtype=jnp.float64,
                           param_dtype=jnp.float64)
        x64 = np.random.default_rng(5).normal(
            0.0, 1.0, size=(B, G, 6, H, W)).astype(np.float64)
        y = np.random.default_rng(6).integers(
            0, NB_CLASSES, size=(B,)).astype(np.int64)
        variables = model.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, G, H, W, 6), jnp.float64), train=False)
        params, batch_stats = variables["params"], variables["batch_stats"]

        tmodel = torch_model_from_flax(
            jax.tree_util.tree_map(np.asarray, params),
            jax.tree_util.tree_map(np.asarray, batch_stats),
            dtype=np.float64)
        for mod in tmodel.modules():
            if isinstance(mod, torch.nn.Dropout):
                mod.p = 0.0
        tmodel.train()
        loss_t = torch.nn.CrossEntropyLoss()(
            tmodel(torch.from_numpy(x64)), torch.from_numpy(y))
        loss_t.backward()

        def loss_fn(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": batch_stats},
                jnp.asarray(np.transpose(x64, (0, 1, 3, 4, 2))), train=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"])
            return cross_entropy(logits, jnp.asarray(y.astype(np.int32)))

        loss_j, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        # ~100x headroom over the measured ~1e-12 noise floor: reduction
        # order differs across BLAS/SIMD configs even at f64
        np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                                   rtol=1e-10)

        gmirror = torch_model_from_flax(
            jax.tree_util.tree_map(np.asarray, grads),
            jax.tree_util.tree_map(np.asarray, batch_stats),
            dtype=np.float64)
        gsd = gmirror.state_dict()
        for name, p in tmodel.named_parameters():
            if p.grad is None:
                continue
            a = gsd[name].detach().numpy()
            t = p.grad.detach().numpy()
            rel = np.linalg.norm(a - t) / max(np.linalg.norm(t), 1e-300)
            assert rel <= 1e-9, f"{name}: grad rel diff {rel:.2e}"
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


def test_torch_sgd_step_parity():
    """One SGD(momentum=0.9, nesterov, wd=3e-5) step lands on the same
    parameters in both frameworks (main.py:89-93), using rxtpu's real
    optimizer path (make_optimizer + masked_grads_with_wd).

    The forward runs in eval mode (BN = affine running-stat constants) so
    the backward is a deterministic chain rule in both frameworks —
    train-mode BN backprop is chaotically order-sensitive (measured up to
    ~20% rel grad noise at depth between equally-correct implementations)
    and would only blur what this pins: conv/pool/head adjoints, the
    coupled weight decay, and the nesterov momentum first-step update.
    """
    import optax

    from rxtpu.train.optim import make_optimizer, masked_grads_with_wd
    from rxtpu.train.step import cross_entropy

    lr, wd = 0.01, 3e-5
    model, params, batch_stats, tmodel = _build_pair(dropout=0.0)
    x, y = _inputs()

    # --- torch step (eval-mode forward, gradients still flow)
    tmodel.eval()
    opt = torch.optim.SGD(tmodel.parameters(), lr=lr, momentum=0.9,
                          nesterov=True, weight_decay=wd)
    loss_t = torch.nn.CrossEntropyLoss()(
        tmodel(torch.from_numpy(x)), torch.from_numpy(y)
    )
    opt.zero_grad()
    loss_t.backward()
    opt.step()

    # --- rxtpu step (same math the train step runs, minus augmentation)
    xs = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    labels = jnp.asarray(y.astype(np.int32))

    def loss_fn(p):
        logits = model.apply(
            {"params": p, "batch_stats": batch_stats}, xs, train=False,
        )
        return cross_entropy(logits, labels)

    loss_j, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=1e-4)

    tx = make_optimizer(lr, nb_epochs=1, steps_per_epoch=1, use_scheduler=False)
    mask = jax.tree_util.tree_map(lambda _: True, params)
    grads_in = masked_grads_with_wd(grads, params, mask, jnp.asarray(True), wd)
    updates, _ = tx.update(grads_in, tx.init(params), params)
    new_params = optax.apply_updates(params, updates)

    # compare representative params across depth: stem, a mid conv, head fc
    checks = [
        ("backbone/conv_init",
         params["backbone"]["conv_init"]["kernel"],
         new_params["backbone"]["conv_init"]["kernel"],
         tmodel.base_nn.conv1.weight, (2, 3, 1, 0)),
        ("backbone/stage3_block4/Conv_1",
         params["backbone"]["stage3_block4"]["Conv_1"]["kernel"],
         new_params["backbone"]["stage3_block4"]["Conv_1"]["kernel"],
         tmodel.base_nn.layer3[3].conv2.weight, (2, 3, 1, 0)),
        ("head/fc2",
         params["head"]["fc2"]["kernel"],
         new_params["head"]["fc2"]["kernel"],
         tmodel.mlp[6].weight, (1, 0)),
        ("head/bn1.scale",
         params["head"]["bn1"]["scale"],
         new_params["head"]["bn1"]["scale"],
         tmodel.mlp[0].weight, None),
    ]
    for name, old, ours, theirs, perm in checks:
        theirs = theirs.detach().numpy()
        if perm is not None:
            theirs = np.transpose(theirs, perm)
        ours, old = np.asarray(ours), np.asarray(old)
        # the params started identical, so the signal is the applied
        # UPDATE. f32 conv summation-order noise in the forward (~1e-4 on
        # the logits) propagates linearly into the update, so compare the
        # update vectors at 1% relative L2 — a wrong wd / momentum /
        # nesterov / freeze-mask term shifts the update by O(100%).
        u_torch, u_ours = theirs - old, ours - old
        norm = np.linalg.norm(u_torch)
        assert norm > 0, f"{name}: step applied no update"
        rel = np.linalg.norm(u_ours - u_torch) / norm
        assert rel < 0.01, f"{name}: update rel-L2 error {rel:.4f}"
