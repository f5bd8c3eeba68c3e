from .imageio import save_png, save_png_scaled, save_hdr, read_png  # noqa: F401
from .metrics import psnr, ssim  # noqa: F401
from .timers import PerformanceTimer  # noqa: F401
