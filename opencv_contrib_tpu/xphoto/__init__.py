"""Computational photography (xphoto-module parity).

Reference anchors: xphoto/src — white balance family (simple_color_balance
.cpp, grayworld_white_balance.cpp, learning_based_color_balance.cpp),
dct denoising (dct_image_denoising.cpp), inpainting (inpainting.cpp FSR/
shift-map), oil painting (oilpainting.cpp), bm3d (bm3d_image_denoising.cpp
— round-2 scope).
"""

from opencv_contrib_tpu.xphoto.white_balance import simple_wb, grayworld_wb
from opencv_contrib_tpu.xphoto.denoise import dct_denoise
from opencv_contrib_tpu.xphoto.artistic import oil_painting
from opencv_contrib_tpu.xphoto.inpaint import inpaint_diffusion
from opencv_contrib_tpu.xphoto.bm3d import bm3d, bm3d_denoise, bm3d_denoise_step2
from opencv_contrib_tpu.xphoto.learning_wb import fit_wb_model, learning_wb, wb_features

__all__ = ["simple_wb", "grayworld_wb", "dct_denoise", "oil_painting", "inpaint_diffusion"]
