"""Training-time semantics parity: BN running-stat updates and the cosine
LR schedule match torch exactly."""

import numpy as np
import torch

from sam2unet_tpu.train.optim import cosine_epoch_schedule


def test_batchnorm_running_stats_match_torch():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 5, 5, 3)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(3)  # momentum 0.1, eps 1e-5
    tbn.train()
    with torch.no_grad():
        tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    fbn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    variables = fbn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _, new_state = fbn.apply(variables, jnp.asarray(x),
                             mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6,
    )
    # torch updates running_var with the UNBIASED batch variance
    # (factor n/(n-1)); flax stores the biased one. At training resolutions
    # (n = B*H*W >= 1e5) the difference is <1e-5 relative — verify the exact
    # relationship at this tiny n instead of pretending they're equal.
    n = 8 * 5 * 5
    flax_var = np.asarray(new_state["batch_stats"]["var"])
    batch_var_biased = (flax_var - 0.9 * 1.0) / 0.1
    expected_torch = 0.9 * 1.0 + 0.1 * batch_var_biased * n / (n - 1)
    np.testing.assert_allclose(
        expected_torch, tbn.running_var.numpy(), rtol=1e-5, atol=1e-6
    )


def test_cosine_schedule_matches_torch():
    epochs, lr0, eta_min, spe = 20, 1e-3, 1e-7, 7
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr0)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, epochs,
                                                       eta_min=eta_min)
    ref = []
    for _ in range(epochs):
        ref.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()

    fn = cosine_epoch_schedule(lr0, epochs, steps_per_epoch=spe,
                               eta_min=eta_min)
    for e in range(epochs):
        for step_in_epoch in (0, spe - 1):  # constant within an epoch
            got = float(fn(e * spe + step_in_epoch))
            # fp32 cos vs torch's float64 recursion: ~2e-6 relative
            np.testing.assert_allclose(got, ref[e], rtol=1e-4, atol=1e-12)
