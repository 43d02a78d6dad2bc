from .ms_ssim import ms_ssim, ssim, masked_ms_ssim
from .psnr import psnr_from_mse, psnr
