from .nets import (A3CNet, ConvGRUA3CNet, ConvGRUCell, DuelingQRNN,
                   PolGradNet, QNet)

__all__ = ["A3CNet", "ConvGRUA3CNet", "ConvGRUCell", "DuelingQRNN",
           "PolGradNet", "QNet"]
