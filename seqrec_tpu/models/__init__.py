from seqrec_tpu.models.updates import (
    Adagrad,
    Adadelta,
    Adam,
    NesterovMomentum,
    RMSProp,
    get_update_manager,
    update_manager_command_parser,
)
from seqrec_tpu.models.recurrent import (
    RecurrentLayers,
    get_recurrent_layers,
    recurrent_layers_command_parser,
)

__all__ = [
    "Adagrad",
    "Adadelta",
    "Adam",
    "NesterovMomentum",
    "RMSProp",
    "RecurrentLayers",
    "get_update_manager",
    "get_recurrent_layers",
    "update_manager_command_parser",
    "recurrent_layers_command_parser",
]
