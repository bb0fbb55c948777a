"""Scheduler parity vs the reference torch scheduler (reference utils/scheduler.py)."""

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

from fr_tpu.train.schedule import cosine_annealing_warmup_restarts


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("cycle,warmup,gamma,cycle_mult,epochs", [
    (15, 5, 1.0, 1.0, 40),
    (100, 5, 1.0, 1.0, 130),
    (20, 3, 0.5, 2.0, 80),
])
def test_cosine_warmup_restarts_matches_reference(cycle, warmup, gamma,
                                                  cycle_mult, epochs):
    add_reference_to_path()
    import torch
    from utils.scheduler import CosineAnnealingWarmupRestarts as Ref

    max_lr, min_lr = 0.05, 0.05 / 1000
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=max_lr)
    ref = Ref(opt, first_cycle_steps=cycle, cycle_mult=cycle_mult,
              max_lr=max_lr, min_lr=min_lr, warmup_steps=warmup, gamma=gamma)

    ours = cosine_annealing_warmup_restarts(
        first_cycle_steps=cycle, max_lr=max_lr, min_lr=min_lr,
        warmup_steps=warmup, cycle_mult=cycle_mult, gamma=gamma)

    ref_lrs, our_lrs = [], []
    for epoch in range(epochs):
        ref_lrs.append(opt.param_groups[0]["lr"])
        our_lrs.append(ours(epoch))
        ref.step()  # stepped per epoch (reference model/FR_PartialFC.py:318)
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-10)


def test_multistep_matches_torch():
    import torch
    from fr_tpu.train.schedule import multistep

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    ref = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[8, 12, 16, 20, 40], gamma=0.95)
    ours = multistep(0.1, [8, 12, 16, 20, 40], 0.95)
    for epoch in range(50):
        np.testing.assert_allclose(ours(epoch), opt.param_groups[0]["lr"],
                                   rtol=1e-10)
        ref.step()


def test_steplr_matches_torch():
    import torch
    from fr_tpu.train.schedule import step_lr

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    ref = torch.optim.lr_scheduler.StepLR(opt, step_size=5, gamma=0.5)
    ours = step_lr(0.1, 5, 0.5)
    for epoch in range(23):
        np.testing.assert_allclose(ours(epoch), opt.param_groups[0]["lr"],
                                   rtol=1e-10)
        ref.step()
