"""LegsAttr: named per-leg container (FL, FR, RL, RR).

API-parity port of the reference's LegsAttr (utils/quadruped_utils.py:16-129) for
the interactive/gym surface. The TPU compute path does NOT use it — batched leg
quantities are plain (4, ...) arrays with the fixed FL,FR,RL,RR axis order
(quadruped_utils.py:54's default order), which vectorizes where the reference's
attribute container forces Python loops.
"""

from __future__ import annotations

import dataclasses
from typing import Any

LEG_ORDER = ('FL', 'FR', 'RL', 'RR')


@dataclasses.dataclass
class LegsAttr:
    """Dataclass to store attributes associated with the legs of a quadruped."""

    FL: Any
    FR: Any
    RL: Any
    RR: Any

    def to_list(self, order=LEG_ORDER):
        return [getattr(self, leg) for leg in order]

    def __getitem__(self, key):
        assert key in LEG_ORDER, f'Invalid leg: {key}'
        return getattr(self, key)

    def __setitem__(self, key, value):
        assert key in LEG_ORDER, f'Invalid leg: {key}'
        setattr(self, key, value)

    def __iter__(self):
        return iter(self.to_list())

    def _binop(self, other, op):
        if isinstance(other, LegsAttr):
            return LegsAttr(*[op(a, b) for a, b in zip(self.to_list(),
                                                       other.to_list())])
        return LegsAttr(*[op(a, other) for a in self.to_list()])

    def __add__(self, other):
        return self._binop(other, lambda a, b: a + b)

    def __sub__(self, other):
        return self._binop(other, lambda a, b: a - b)

    def __truediv__(self, other):
        return self._binop(other, lambda a, b: a / b)

    def __mul__(self, other):
        return self._binop(other, lambda a, b: a * b)

    def __matmul__(self, other):
        return self._binop(other, lambda a, b: a @ b)

    def __repr__(self):
        return f'LegsAttr(FL={self.FL}, FR={self.FR}, RL={self.RL}, RR={self.RR})'
