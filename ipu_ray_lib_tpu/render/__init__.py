from .shadow import shadow_trace
from .path import path_trace_sample
from .renderer import render, RenderOutput
from .aov import make_aov_image, VisualiseMode
