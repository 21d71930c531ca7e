"""Orbax checkpointing of impedance params + optimizer state.

The reference has no checkpointing beyond a commented-out ``torch.save``
(``[DEMO] Train MRI to Impedance MLP.ipynb`` cell 11); here checkpoint /
resume is a first-class subsystem (SURVEY section 5).
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp


def save_checkpoint(path: str, state) -> None:
    """Save a pytree (e.g. ``{'params': ..., 'opt_state': ..., 'step': ...}``)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)


def load_checkpoint(path: str, template=None):
    """Restore a pytree; ``template`` (same structure, abstract or concrete
    arrays) restores exact dtypes/shardings when given."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)
