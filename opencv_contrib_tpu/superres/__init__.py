"""Multi-frame video super-resolution (superres-module parity).

Reference anchor: BTV-L1 (superres/src/btv_l1.cpp,
createSuperResolution_BTVL1, superres.hpp:199): optical-flow-aligned
multi-frame fusion with bilateral-TV regularization, pluggable dense flow
(our flow.dis plays DenseOpticalFlowExt's role).
"""

from opencv_contrib_tpu.superres.btv import btv_l1

__all__ = ["btv_l1"]
