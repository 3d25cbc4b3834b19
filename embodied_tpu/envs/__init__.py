from .dummy import Dummy
from .pinpad import PinPad

# Suite adapters with external dependencies import lazily via
# embodied_tpu.models.common.ENV_CTORS.
