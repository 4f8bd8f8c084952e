"""Drop-in equivalent of python-examples/eyeRendererHelperFunctions.py.

Scripts that `import eyeRendererHelperFunctions as eyeTools` can instead
`from compound_ray_tpu import eye_tools as eyeTools` (or add this module to
their path under that name) — every public helper keeps its reference name
and semantics (eyeRendererHelperFunctions.py:1-202).
"""

from __future__ import annotations

import math
from ctypes import Structure, c_float

import numpy as np


class c_float3(Structure):
    _fields_ = [("x", c_float), ("y", c_float), ("z", c_float)]

    def toNumpy(self):
        return np.asarray([self.x, self.y, self.z])


class Ommatidium:
    """Reference-compatible record (attribute names match the helper)."""

    def __init__(self, position, direction, acceptanceAngle, focalpointOffset):
        self.position = position
        self.direction = direction
        self.acceptanceAngle = acceptanceAngle
        self.focalpointOffset = focalpointOffset

    def getSolidAngle(self):
        """Solid angle (steradians) of the acceptance cone."""
        return 2.0 * math.pi * (1.0 - math.cos(self.acceptanceAngle / 2.0))

    def copy(self):
        return Ommatidium(
            self.position.copy(), self.direction.copy(),
            self.acceptanceAngle, self.focalpointOffset,
        )


class c_ommatidiumPacket(Structure):
    _fields_ = [
        ("posX", c_float), ("posY", c_float), ("posZ", c_float),
        ("dirX", c_float), ("dirY", c_float), ("dirZ", c_float),
        ("acceptanceAngle", c_float), ("focalpointOffset", c_float),
    ]


def configureFunctions(eyeRenderer):
    """No-op compatible configuration: the shim self-describes its types, but
    we still set the restypes the reference helper sets so downstream code
    relying on them behaves identically."""
    import ctypes
    from numpy.ctypeslib import ndpointer

    eyeRenderer.renderFrame.restype = ctypes.c_double
    eyeRenderer.getCameraCount.restype = ctypes.c_size_t
    eyeRenderer.getCurrentCameraIndex.restype = ctypes.c_size_t
    eyeRenderer.getCurrentCameraName.restype = ctypes.c_char_p
    eyeRenderer.gotoCameraByName.restype = ctypes.c_bool
    eyeRenderer.isCompoundEyeActive.restype = ctypes.c_bool
    eyeRenderer.getCurrentEyeSamplesPerOmmatidium.restype = ctypes.c_int
    eyeRenderer.getCurrentEyeOmmatidialCount.restype = ctypes.c_size_t
    eyeRenderer.getCurrentEyeDataPath.restype = ctypes.c_char_p
    eyeRenderer.isInsideHitGeometry.restype = ctypes.c_bool


def setCameraLocalSpace(eyeRenderer, npMatrix):
    newX = npMatrix[:, 0]
    newY = npMatrix[:, 1]
    newZ = npMatrix[:, 2]
    eyeRenderer.setCameraLocalSpace(*newX, *newY, *newZ)


def setRenderSize(eyeRenderer, width, height):
    """Update render size (frame pointer shape follows automatically)."""
    eyeRenderer.setRenderSize(width, height)
    from numpy.ctypeslib import ndpointer
    from ctypes import c_ubyte

    eyeRenderer.getFramePointer.restype = ndpointer(
        dtype=c_ubyte, shape=(height, width, 4)
    )


def setOmmatidiaFromPacketList(eyeRenderer, packetList):
    ommCount = len(packetList)
    c_omm_array_type = c_ommatidiumPacket * ommCount
    c_ommArray = c_omm_array_type(*packetList)
    eyeRenderer.setOmmatidia(c_ommArray, ommCount)


def setOmmatidiaFromOmmatidiumList(eyeRenderer, ommList):
    packetList = [
        c_ommatidiumPacket(
            *[float(n) for n in o.position],
            *[float(n) for n in o.direction],
            o.acceptanceAngle, o.focalpointOffset,
        )
        for o in ommList
    ]
    setOmmatidiaFromPacketList(eyeRenderer, packetList)


def gotoFirstCompoundEye(eyeRenderer):
    camCount = eyeRenderer.getCameraCount()
    for i in range(camCount):
        eyeRenderer.gotoCamera(int(i))
        if eyeRenderer.isCompoundEyeActive():
            print("Found compound eye:", eyeRenderer.getCurrentCameraName())
            print("\twith compound data at:", eyeRenderer.getCurrentEyeDataPath())
            print("\twith this many ommatidia:",
                  eyeRenderer.getCurrentEyeOmmatidialCount())
            return
    raise Exception("Error: Could not find compound eye in provided GlTF scene.")


def gotoFirstRegularCamera(eyeRenderer):
    camCount = eyeRenderer.getCameraCount()
    for i in range(camCount):
        eyeRenderer.gotoCamera(int(i))
        if not eyeRenderer.isCompoundEyeActive():
            print("Found regular camera:", eyeRenderer.getCurrentCameraName())
            return
    raise Exception("Error: Could not find compound eye in provided GlTF scene.")


def readEyeFile(path):
    output = []
    with open(path) as eyeFile:
        for line in eyeFile:
            if line.strip():
                output.append(_getEyeFeatures(line))
    return output


def saveEyeFile(path, omms):
    with open(path, "w") as eyeFile:
        for omm in omms:
            eyeFile.write(
                "{:0.10f} {:0.10f} {:0.10f} {:0.10f} {:0.10f} {:0.10f} {:0.10f} {:0.10f}\n".format(
                    omm.position[0], omm.position[1], omm.position[2],
                    omm.direction[0], omm.direction[1], omm.direction[2],
                    omm.acceptanceAngle, omm.focalpointOffset,
                )
            )


def decodeProjectionMapID(RGBAquadlet):
    r = RGBAquadlet[0] << 24
    g = RGBAquadlet[1] << 16
    b = RGBAquadlet[2] << 8
    a = RGBAquadlet[3]
    return r | g | b | a


def getProjectionImageUsingMap(vector, idMap, pjWidth, pjHeight):
    """Re-project a per-ommatidium vector through an _ids projection map."""
    output = np.zeros((pjWidth, pjHeight), dtype=np.uint8)
    for x in range(pjWidth):
        for y in range(pjHeight):
            pixelId = decodeProjectionMapID(idMap[y, x, :])
            output[y, x] = int(vector[pixelId])
    return output


def getIcoOmmatidia():
    """12 equidistant ommatidia on an icosphere, 1 steradian each."""
    icoPoints = [[0, 1, 0]]
    angles = [0.4 * math.pi * i for i in range(5)]
    offsetAngle = math.atan(0.5)
    planarDistance = math.cos(offsetAngle)
    verticalOffset = math.sin(offsetAngle)
    icoPoints += [
        [math.cos(a) * planarDistance, verticalOffset, math.sin(a) * planarDistance]
        for a in angles
    ]
    angles = [a + 0.2 * math.pi for a in angles]
    icoPoints += [
        [math.cos(a) * planarDistance, -verticalOffset, math.sin(a) * planarDistance]
        for a in angles
    ]
    icoPoints.append([0, -1, 0])
    icoPoints = [np.asarray(p) for p in icoPoints]
    oneSteradianAcceptanceAngle = math.acos(-(1 / (2 * math.pi) - 1)) * 2
    return [
        Ommatidium(np.zeros(3), p, oneSteradianAcceptanceAngle, 0.0)
        for p in icoPoints
    ]


def _getEyeFeatures(line):
    data = [float(n) for n in line.split(" ")]
    position = np.asarray(data[:3])
    direction = np.asarray(data[3:6])
    acceptanceAngle = data[6]
    focalPointOffset = data[7]
    return Ommatidium(position, direction, acceptanceAngle, focalPointOffset)
