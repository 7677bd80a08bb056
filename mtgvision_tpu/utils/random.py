"""Jittable random-apply combinators — the augmentation-pipeline DSL.

Rebuild of mtgvision/util/random.py:56-102 (``Applicator``/``ApplyOrdered``/
``ApplyShuffled``/``ApplyChoice``) for XLA: every augmentation is a pure
``(key, img) -> img`` function of fixed shape, and the combinators compose them
into a single pure function of the same signature, so a whole pipeline jits,
vmaps over a batch, and runs on-device:

- ``ApplyOrdered(f, g, …)``  — apply all, in order (random.py:81-85)
- ``ApplyShuffled(f, g, …)`` — apply all, in random order (random.py:88-97);
  implemented as a ``lax.switch`` over the sampled permutation at each slot
- ``ApplyChoice(f, None, …)``— apply exactly one, ``None`` = identity
  (random.py:100-102); ``lax.switch`` over the choice

``seed_all`` (random.py:32-40) has no equivalent: JAX randomness is explicit
key-threading by construction.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

AugFn = Callable[[jax.Array, jnp.ndarray], jnp.ndarray]


def seed_all(seed: int) -> jax.Array:
    """Seed python/numpy global RNGs and return a JAX PRNGKey
    (util/random.py:32-40 seeds random/numpy/torch; JAX randomness itself is
    explicit key-threading — the returned key is the root)."""
    import random as _random

    import numpy as _np

    _random.seed(seed)
    _np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def _identity(key, img):
    return img


def _as_fn(f: Optional[AugFn]) -> AugFn:
    return _identity if f is None else f


class Applicator:
    """Base: callable (key, img) -> img built from sub-augmentations."""

    def __init__(self, *fns: Optional[AugFn]):
        self.fns = [_as_fn(f) for f in fns]

    def __call__(self, key, img):
        raise NotImplementedError


class ApplyOrdered(Applicator):
    def __call__(self, key, img):
        keys = jax.random.split(key, len(self.fns))
        for f, k in zip(self.fns, keys):
            img = f(k, img)
        return img


class ApplyChoice(Applicator):
    def __call__(self, key, img):
        kc, ka = jax.random.split(key)
        idx = jax.random.randint(kc, (), 0, len(self.fns))
        return lax.switch(idx, self.fns, ka, img)


class Maybe(Applicator):
    """Apply ``fn`` with probability ``p`` — albumentations' per-transform
    ``p=`` (od_datasets.py:420-512 pipelines)."""

    def __init__(self, p: float, fn: AugFn):
        super().__init__(fn)
        self.p = p

    def __call__(self, key, img):
        kb, ka = jax.random.split(key)
        do = jax.random.bernoulli(kb, self.p)
        return lax.cond(do, self.fns[0], _identity, ka, img)


class ApplySome(Applicator):
    """Apply ``n`` randomly-chosen distinct augs in random order — the
    reference's ``random_order(…, n=k)`` albumentations helper
    (od_datasets.py:420-445)."""

    def __init__(self, n: int, *fns: Optional[AugFn]):
        super().__init__(*fns)
        self.n = min(n, len(self.fns))

    def __call__(self, key, img):
        kp, ka = jax.random.split(key)
        perm = jax.random.permutation(kp, len(self.fns))
        keys = jax.random.split(ka, self.n)
        # unrolled python loop, NOT lax.fori_loop: XLA while-loop iterations
        # execute as separate host round-trips on remote-dispatch runtimes
        # (measured ~23 ms+/iteration), and n is tiny anyway
        for i in range(self.n):
            img = lax.switch(perm[i], self.fns, keys[i], img)
        return img


class ApplyShuffled(Applicator):
    def __call__(self, key, img):
        n = len(self.fns)
        kp, ka = jax.random.split(key)
        perm = jax.random.permutation(kp, n)
        keys = jax.random.split(ka, n)
        # unrolled (see ApplySome) — n ≤ ~7 in every reference pipeline
        for i in range(n):
            img = lax.switch(perm[i], self.fns, keys[i], img)
        return img
