"""Stepwise golden test of the OneCycle LR/momentum schedules against
torch.optim.lr_scheduler.OneCycleLR (the reference builds it per-step at
trainer/trainer.py:39-42 with anneal_strategy='cos' + cycle_momentum)."""

import numpy as np
import pytest
import torch

from patchrefinerv2_tpu.training.optim import (
    _momentum_schedule,
    _onecycle_lr_schedule,
)


@pytest.mark.parametrize(
    "total,pct_start,div,final_div",
    [(200, 0.3, 2.0, 100.0), (120, 0.5, 1.0, 10000.0), (50, 0.3, 25.0, 1e4)],
)
def test_lr_and_momentum_match_torch(total, pct_start, div, final_div):
    max_lr, base_m, max_m = 1.2e-4, 0.85, 0.95
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=max_lr, betas=(max_m, 0.999))
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, total_steps=total, pct_start=pct_start,
        anneal_strategy="cos", cycle_momentum=True,
        base_momentum=base_m, max_momentum=max_m,
        div_factor=div, final_div_factor=final_div,
    )
    ref_lr, ref_m = [], []
    for _ in range(total):
        ref_lr.append(opt.param_groups[0]["lr"])
        ref_m.append(opt.param_groups[0]["betas"][0])
        opt.step()
        sched.step()

    lr_fn = _onecycle_lr_schedule(total, max_lr, pct_start, div, final_div)
    m_fn = _momentum_schedule(total, pct_start, base_m, max_m)
    got_lr = np.asarray([float(lr_fn(i)) for i in range(total)])
    got_m = np.asarray([float(m_fn(i)) for i in range(total)])

    np.testing.assert_allclose(got_lr, np.asarray(ref_lr), rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(got_m, np.asarray(ref_m), rtol=1e-5, atol=1e-7)
