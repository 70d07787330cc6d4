"""Optimizer factory ("update manager").

CLI surface and the filename-encoded ``name`` strings match
/root/reference/neural_networks/update_manager.py:3-82 (``Ug_lr…``,
``Ud_lr…_rho…``, ``Ur…``, ``Un…``, ``Ua…``); the update math is optax
gradient transformations applied inside the jitted train step instead of
Theano shared-variable updates.
"""

from __future__ import annotations

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
        return Adam(learning_rate=args.u_l, beta1=args.u_b1, beta2=args.u_b2)
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
        self, learning_rate: float = 0.001, beta1: float = 0.9, beta2: float = 0.999
    ):
        self.learning_rate = learning_rate
        self.beta1 = beta1
        self.beta2 = beta2
        self.name = (
            "Ua_lr" + str(learning_rate) + "_b1" + str(beta1) + "_b2" + str(beta2)
        )

    def make(self):
        return optax.adam(self.learning_rate, b1=self.beta1, b2=self.beta2, eps=1e-8)
