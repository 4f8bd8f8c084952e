"""End-to-end API walkthrough (python-examples/primary-example.py:18-98).

Same flow as the reference script — load scene, cycle cameras, render, save
PPMs, bump a compound eye's sample rate — but pointed at the TPU backend via
the ctypes-compatible shim.  The original script runs unchanged if you swap
its CDLL(...) line for load_eye_renderer().
"""

import os
import sys
from ctypes import c_char_p

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from compound_ray_tpu import eye_tools as eyeTools
from compound_ray_tpu.api.shim import load_eye_renderer

SCENE = os.environ.get(
    "CR_SCENE", "/root/reference/data/test-scene/test-scene.gltf"
)


def main():
    os.makedirs("test-images", exist_ok=True)

    eyeRenderer = load_eye_renderer()
    print("Successfully loaded", eyeRenderer)
    eyeTools.configureFunctions(eyeRenderer)

    eyeRenderer.loadGlTFscene(c_char_p(SCENE.encode()))

    renderWidth, renderHeight = 200, 200
    eyeTools.setRenderSize(eyeRenderer, renderWidth, renderHeight)

    for i in range(min(5, eyeRenderer.getCameraCount())):
        renderTime = eyeRenderer.renderFrame()
        print("View from camera '", eyeRenderer.getCurrentCameraName(),
              "' rendered in ", renderTime, "ms")
        eyeRenderer.displayFrame()
        eyeRenderer.saveFrameAs(
            c_char_p(f"test-images/test-image-{i}.ppm".encode())
        )
        frameData = eyeRenderer.getFramePointer()
        print("FrameData shape:", frameData.shape)

        if eyeRenderer.isCompoundEyeActive():
            print("This one's a compound eye; raising the sample rate...")
            eyeRenderer.setCurrentEyeSamplesPerOmmatidium(100)
            eyeRenderer.renderFrame()
            eyeRenderer.saveFrameAs(
                c_char_p(f"test-images/test-image-{i}-100samples.ppm".encode())
            )
        eyeRenderer.nextCamera()

    eyeRenderer.stop()


if __name__ == "__main__":
    main()
