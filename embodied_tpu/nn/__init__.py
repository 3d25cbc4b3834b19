from .core import (
    COMPUTE_DTYPE, Ctx, Initializer, Module, act, available, cast, f32, init,
    mask, pure, scan, set_compute_dtype, sharding_hint, symexp, symlog,
    where)
from .layers import (
    Attention, BlockLinear, Conv2D, Conv3D, DictConcat, DictEmbed, Embed,
    GRU, Linear, MLP, Norm, Transformer, rope)
from .heads import DictHead, Head, MLPHead
from .opt import Optimizer, get_data_axes
from .train_utils import Normalize, SlowModel
from .stacked import StackedLayers
from . import core
from . import dists
from . import layers
from . import opt
