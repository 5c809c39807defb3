from .warp import grid_sample
from .resize import resize_bilinear, make_interp_matrix
from .charbonnier import charbonnier_loss
from .segment import get_local_idx, segment_starts

__all__ = ['grid_sample', 'resize_bilinear', 'make_interp_matrix',
           'charbonnier_loss', 'get_local_idx', 'segment_starts']
