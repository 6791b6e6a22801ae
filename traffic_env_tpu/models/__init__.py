from .nets import (A3CNet, ConvGRUA3CNet, ConvGRUCell, ConvQNet,
                   DuelingQRNN, PolGradNet, QNet, obs_grid_channels)

__all__ = ["A3CNet", "ConvGRUA3CNet", "ConvGRUCell", "ConvQNet",
           "DuelingQRNN", "PolGradNet", "QNet", "obs_grid_channels"]
