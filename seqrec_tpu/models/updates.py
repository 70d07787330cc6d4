"""Optimizer factory ("update manager").

CLI surface and the filename-encoded ``name`` strings match
/root/reference/neural_networks/update_manager.py:3-82 (``Ug_lr…``,
``Ud_lr…_rho…``, ``Ur…``, ``Un…``, ``Ua…``); the update math is optax
gradient transformations applied inside the jitted train step instead of
Theano shared-variable updates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def update_manager_command_parser(parser) -> None:
    parser.add_argument(
        "--u_m",
        dest="update_manager",
        choices=["adagrad", "adadelta", "rmsprop", "nesterov", "adam"],
        help="Update mechanism",
        default="adam",
    )
    parser.add_argument("--u_l", help="Learning rate", default=0.001, type=float)
    parser.add_argument(
        "--u_rho",
        help="rho for Adadelta/RMSProp (momentum for Nesterov)",
        default=0.9,
        type=float,
    )
    parser.add_argument("--u_b1", help="Beta 1 for Adam", default=0.9, type=float)
    parser.add_argument("--u_b2", help="Beta 2 for Adam", default=0.999, type=float)
    parser.add_argument(
        "--u_moments",
        dest="moment_dtype",
        choices=["float32", "bfloat16"],
        default="float32",
        help="Adam moment storage dtype. bfloat16 halves the optimizer's "
        "HBM traffic for the moment reads/writes (the measured step-time "
        "bound at 10^5-item catalogs, see BASELINE.md matrix); the "
        "update math still runs in float32.",
    )


def get_update_manager(args):
    if args.update_manager == "adagrad":
        return Adagrad(learning_rate=args.u_l)
    if args.update_manager == "adadelta":
        return Adadelta(learning_rate=args.u_l, rho=args.u_rho)
    if args.update_manager == "rmsprop":
        return RMSProp(learning_rate=args.u_l, rho=args.u_rho)
    if args.update_manager == "nesterov":
        return NesterovMomentum(learning_rate=args.u_l, momentum=args.u_rho)
    if args.update_manager == "adam":
        return Adam(
            learning_rate=args.u_l,
            beta1=args.u_b1,
            beta2=args.u_b2,
            moment_dtype=getattr(args, "moment_dtype", "float32"),
        )
    raise ValueError("Unknown update option")


class UpdateManager:
    """Carries a display ``name`` (used in model filenames) and builds the
    optax transformation on demand."""

    name: str

    def make(self) -> optax.GradientTransformation:  # pragma: no cover
        raise NotImplementedError


class Adagrad(UpdateManager):
    def __init__(self, learning_rate: float = 0.1):
        self.learning_rate = learning_rate
        self.name = "Ug_lr" + str(learning_rate)

    def make(self):
        # Lasagne adagrad: eps=1e-6, zero initial accumulator.
        return optax.adagrad(
            self.learning_rate, initial_accumulator_value=0.0, eps=1e-6
        )


class Adadelta(UpdateManager):
    def __init__(self, learning_rate: float = 1.0, rho: float = 0.9):
        self.learning_rate = learning_rate
        self.rho = rho
        self.name = "Ud_lr" + str(learning_rate) + "_rho" + str(rho)

    def make(self):
        return optax.adadelta(self.learning_rate, rho=self.rho, eps=1e-6)


class RMSProp(UpdateManager):
    def __init__(self, learning_rate: float = 1.0, rho: float = 0.9):
        self.learning_rate = learning_rate
        self.rho = rho
        self.name = "Ur_lr" + str(learning_rate) + "_rho" + str(rho)

    def make(self):
        return optax.rmsprop(self.learning_rate, decay=self.rho, eps=1e-6)


class NesterovMomentum(UpdateManager):
    def __init__(self, learning_rate: float = 1.0, momentum: float = 0.9):
        self.learning_rate = learning_rate
        self.momentum = momentum
        self.name = "Un_lr" + str(learning_rate) + "_m" + str(momentum)

    def make(self):
        return optax.sgd(self.learning_rate, momentum=self.momentum, nesterov=True)


class Adam(UpdateManager):
    def __init__(
        self,
        learning_rate: float = 0.001,
        beta1: float = 0.9,
        beta2: float = 0.999,
        moment_dtype: str = "float32",
    ):
        self.learning_rate = learning_rate
        self.beta1 = beta1
        self.beta2 = beta2
        self.moment_dtype = moment_dtype
        self.name = (
            "Ua_lr" + str(learning_rate) + "_b1" + str(beta1) + "_b2" + str(beta2)
        )
        if moment_dtype != "float32":
            # keep legacy filenames byte-identical for the f32 default
            self.name += "_mbf16"

    def make(self):
        if self.moment_dtype == "float32":
            return optax.adam(
                self.learning_rate, b1=self.beta1, b2=self.beta2, eps=1e-8
            )
        return optax.chain(
            _scale_by_adam_bf16_moments(self.beta1, self.beta2, 1e-8),
            optax.scale(-self.learning_rate),
        )


_RBG_OK: bool | None = None


def _rbg_supported() -> bool:
    """Whether the backend actually lowers RngBitGenerator. Probed by
    GENERATING bits once (key construction alone never fails — it only
    packs the seed; the unsupported-op error surfaces at lowering)."""
    global _RBG_OK
    if _RBG_OK is None:
        try:
            jax.random.bits(
                jax.random.key(0, impl="rbg"), (8,), jnp.uint32
            ).block_until_ready()
            _RBG_OK = True
        except Exception:
            _RBG_OK = False
    return _RBG_OK


def _stochastic_round_bf16(key, x32):
    """Unbiased float32 → bfloat16 rounding: add a uniform random value
    in [0, 1) of the dropped-mantissa ulp to the low 16 bits, truncate.

    Round-to-NEAREST would silently ABSORB small EMA increments: Adam's
    second moment moves by (1-b2)=0.001 of itself per step, below
    bf16's ~0.4% ulp, so nearest-rounding freezes nu forever (verified:
    2000 zero-grad steps leave a nearest-rounded nu exactly at 1.0 while
    f32 decays to 0.135). Stochastic rounding keeps every increment in
    expectation, which is all an EMA needs."""
    bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    noise = jax.random.bits(key, x32.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = jax.lax.bitcast_convert_type(
        ((bits + noise) >> 16) << 16, jnp.float32
    )
    # non-finite moments (transient gradient overflow) must stay what
    # they are: dithering in raw bit space is only meaningful for finite
    # values, so pass inf/NaN through the plain dtype cast instead
    return jnp.where(jnp.isfinite(x32), rounded, x32).astype(jnp.bfloat16)


def _scale_by_adam_bf16_moments(b1: float, b2: float, eps: float):
    """Adam moment tracking with BOTH moments stored in bfloat16.

    Why: at 10^5-item catalogs the train step is bound by the optimizer's
    HBM traffic, not matmuls — dense Adam reads+writes 16 B/param of
    moment state per step (measured in BASELINE.md's MXU matrix: ~5.7 GB
    per step at H=256/200k vs ~3.6 ms of matmul). bf16 storage halves
    that to 8 B/param; the accumulate/update math runs in f32 registers
    and the STORE uses stochastic rounding (see _stochastic_round_bf16 —
    nearest-rounding would absorb the second moment's (1-b2)-sized
    increments entirely).

    `tests/test_optimizers.py` asserts short-horizon trajectory
    closeness against f32 Adam AND long-horizon EMA tracking (the
    absorption regression test).
    """

    def init_fn(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), jnp.bfloat16)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1**c
        bc2 = 1.0 - b2**c
        # per-step stream derived from the step count, independent
        # across steps and leaves. The rounding noise covers
        # ~2 x n_params elements per step, so the generator cost
        # matters: Threefry bits for 10^8-element moment tables cost
        # more than the bf16 bandwidth they enable; the hardware-backed
        # "rbg" generator is cheap. Caveats, both fine for rounding
        # dither: rbg's stream quality is weaker, and XLA does NOT
        # guarantee RngBitGenerator output stable across versions /
        # backends / shardings — the EMA stays unbiased under ANY
        # dither stream, but bitwise exact-resume reproducibility of
        # bf16 moments holds only within one runtime.
        root = (
            jax.random.key(0x5EED, impl="rbg")
            if _rbg_supported()
            else jax.random.PRNGKey(0x5EED)
        )
        base_key = jax.random.fold_in(root, count)

        def step(i, g, m, v):
            k1, k2 = jax.random.split(jax.random.fold_in(base_key, i))
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * (g32 * g32)
            upd = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            return (
                upd,
                _stochastic_round_bf16(k1, m32),
                _stochastic_round_bf16(k2, v32),
            )

        flat, treedef = jax.tree_util.tree_flatten(updates)
        mu_flat = treedef.flatten_up_to(state.mu)
        nu_flat = treedef.flatten_up_to(state.nu)
        out = [
            step(i, g, m, v)
            for i, (g, m, v) in enumerate(zip(flat, mu_flat, nu_flat))
        ]
        upd = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return upd, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
