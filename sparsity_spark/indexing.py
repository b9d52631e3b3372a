"""loc / iloc indexer objects — the reference's selection syntax
(reference indexing.py:3-21) as thin sugar over the frame's scalable
selection methods.

``sf.loc['a']``, ``sf.loc[['a','b']]``, ``sf.loc['2016-10-01':'2016-10-03']``
(stop-INCLUSIVE label slice), ``sf.loc[bool_mask]``;
``sf.iloc[3]``, ``sf.iloc[1:4]``, ``sf.iloc[[3, 4]]``.
"""

from __future__ import annotations


class LocIndexer:
    def __init__(self, frame):
        self._frame = frame

    def __getitem__(self, item):
        f = self._frame
        if isinstance(item, slice):
            if item.step is not None:
                raise ValueError("label slices do not support a step")
            return f.loc_range(item.start, item.stop)
        if isinstance(item, tuple):
            # pandas tuple semantics are positional across index levels:
            # on a composite-key frame a matching-arity tuple is ONE
            # composite row lookup; anything else (row+column shorthand,
            # partial tuples) is ambiguous — treating it as a label LIST
            # silently selected wrong rows, so refuse with guidance
            if len(item) == len(f.key_cols) and len(f.key_cols) > 1:
                return f.loc_composite(item)
            raise ValueError(
                f"tuple loc lookup with {len(item)} element(s) on a "
                f"{len(f.key_cols)}-level index is ambiguous — use a LIST "
                f"for multiple row labels (sf.loc[['a','b']]) or chain "
                f"column selection (sf.loc['a']['b'])"
            )
        if isinstance(item, list):
            if _is_bool_array(item):
                return f.loc_mask(list(item))
            return f.loc_in(list(item))
        if _is_bool_array(item):
            return f.loc_mask(list(item))
        return f.loc_in([item])


class IlocIndexer:
    def __init__(self, frame):
        self._frame = frame

    def __getitem__(self, item):
        f = self._frame
        if isinstance(item, slice):
            if item.step is not None:
                raise ValueError("positional slices do not support a step")
            return f.iloc_slice(item.start, item.stop)
        if isinstance(item, (list, tuple)):
            return f.take(list(item))
        return f.take([int(item)])


def _is_bool_array(x) -> bool:
    import numpy as np

    if isinstance(x, np.ndarray):
        return x.dtype == bool
    if isinstance(x, (list, tuple)) and x:
        # np.bool_ is NOT a bool subclass — a list(np.array(...) > 0) mask
        # must still be recognized as a mask, not label lookups
        return all(isinstance(v, (bool, np.bool_)) for v in x)
    return False
