from . import adc
from . import bmm
from . import max_sim
from . import segment_ops
from . import pallas_gather
