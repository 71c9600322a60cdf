from . import adc
from . import max_sim
from . import segment_ops
