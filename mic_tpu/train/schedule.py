"""LR schedules. The reference's schedule is linear warmup from 0 to lr over
`warmup_steps`, then linear decay to 0 over the remaining steps
(main.py:281-292); reproduced here with optax."""

from __future__ import annotations

import optax


def linear_warmup_linear_decay(
    learning_rate: float, total_steps: int, warmup_steps: int
) -> optax.Schedule:
    warmup = optax.linear_schedule(
        init_value=0.0, end_value=learning_rate, transition_steps=max(warmup_steps, 1)
    )
    decay = optax.linear_schedule(
        init_value=learning_rate,
        end_value=0.0,
        transition_steps=max(total_steps - warmup_steps, 1),
    )
    return optax.join_schedules([warmup, decay], boundaries=[warmup_steps])
