"""The reference README's two flows (reference Readme.md:8-26), verbatim on
this framework's containers. Run from the repo root:

    python examples/readme_flows.py /root/reference/assets
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# default to CPU (probing the backend would initialize the tunneled TPU);
# set STEPTH_EXAMPLE_PLATFORM=tpu to run on the chip
jax.config.update("jax_platforms", os.environ.get("STEPTH_EXAMPLE_PLATFORM", "cpu"))

from stepth_tpu import DepthFrame

assets = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/assets"
precision = (36, 36, 36)  # 255//7 per channel, as the README suggests

# Flow 1: derive depth from the additional view and save it.
img = DepthFrame.open(f"{assets}/main.jpg")
img = img.open_depth_from_additional(f"{assets}/additional.jpg", precision)
img.save_depth("/tmp/depth.png")

# Flow 2: load a depth map, invert, select the foreground, mask the photo.
img2 = DepthFrame.open(f"{assets}/main.jpg").open_depth("/tmp/depth.png")
mask = img2.invert_depth().select_foreground().apply_mask()
mask.save("/tmp/foreground.png")  # quirk Q7: saves the masked image

print("wrote /tmp/depth.png and /tmp/foreground.png")
