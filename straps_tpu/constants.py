"""Global geometry / joint-convention constants.

TPU-native re-implementation of the conventions defined in the reference
STRAPS repo (`config.py:13-32`).  These are *conventions*, not code: the joint
index maps must match exactly for metric parity with the reference.
"""

# Camera convention (reference config.py:13-14).
FOCAL_LENGTH = 5000.0
REGRESSOR_IMG_WH = 256

# SMPL model dimensions.
NUM_VERTS = 6890
NUM_FACES = 13776
NUM_BODY_JOINTS = 23          # body joints excluding root
NUM_SMPL_JOINTS = 24          # kinematic-tree joints incl. root
NUM_BETAS = 10

# Joint superset layout produced by the body model (reference
# models/smpl_official.py:30-34 and config.py:20-28):
#   [0:24)   SMPL kinematic joints
#   [24:45)  vertex-picked keypoints (face 5 + feet 6 + finger tips 10)
#   [45:54)  9 "extra" regressed joints
#   [54:73)  19 cocoplus regressed joints
#   [73:90)  17 H36M regressed joints
NUM_JOINTS_SUPERSET = 90

# Superset -> 17 COCO joints (reference config.py:27).
ALL_JOINTS_TO_COCO_MAP = [24, 26, 25, 28, 27, 16, 17, 18, 19, 20, 21, 1, 2, 4, 5, 7, 8]
# Superset -> 17 H36M joints (reference config.py:28).
ALL_JOINTS_TO_H36M_MAP = list(range(73, 90))
# 17 H36M joints -> 17/14 LSP joints (reference config.py:31-32).
H36M_TO_J17 = [6, 5, 4, 1, 2, 3, 16, 15, 14, 11, 12, 13, 8, 10, 0, 7, 9]
H36M_TO_J14 = H36M_TO_J17[:14]

# COCO-17 hip joint indices (used by joint-deviation augmentation,
# reference augmentation/proxy_rep_augmentation.py:38-39).
COCO_HIP_JOINTS = [11, 12]

# Vertex ids used to pick the 21 extra keypoints appended after the 24
# kinematic joints (same ids the smplx package uses for the SMPL topology,
# consumed by reference models/smpl_official.py via `smplx`).
SMPL_VERTEX_IDS = {
    "nose": 332,
    "reye": 6260,
    "leye": 2800,
    "rear": 4071,
    "lear": 583,
    "LBigToe": 3216,
    "LSmallToe": 3226,
    "LHeel": 3387,
    "RBigToe": 6617,
    "RSmallToe": 6624,
    "RHeel": 6787,
    "lthumb": 2746,
    "lindex": 2319,
    "lmiddle": 2445,
    "lring": 2556,
    "lpinky": 2673,
    "rthumb": 6191,
    "rindex": 5782,
    "rmiddle": 5905,
    "rring": 6016,
    "rpinky": 6133,
}
# Order in which the extra keypoints are appended (face, feet, hands - the
# order the reference inherits from smplx's VertexJointSelector).
SMPL_EXTRA_KEYPOINT_ORDER = [
    "nose", "reye", "leye", "rear", "lear",
    "LBigToe", "LSmallToe", "LHeel", "RBigToe", "RSmallToe", "RHeel",
    "lthumb", "lindex", "lmiddle", "lring", "lpinky",
    "rthumb", "rindex", "rmiddle", "rring", "rpinky",
]

# SMPL kinematic tree: parent of each of the 24 joints (root = -1).
SMPL_PARENTS = [
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21
]

# 6-body-part segmentation convention (reference renderers/nmr_renderer.py:13-20):
# 0=background, 1=left arm, 2=right arm, 3=head, 4=left leg, 5=right leg, 6=torso.
PART_BACKGROUND = 0
PART_LEFT_ARM = 1
PART_RIGHT_ARM = 2
PART_HEAD = 3
PART_LEFT_LEG = 4
PART_RIGHT_LEG = 5
PART_TORSO = 6
NUM_PARTS = 6  # foreground parts

# SMPL kinematic joint -> body part, used to derive per-face part ids for the
# rasterizer (replaces the reference's vertex_texture/cube_parts color-cube
# decode, renderers/nmr_renderer.py:93-101).  Joint names follow the standard
# SMPL ordering.
SMPL_JOINT_TO_PART = [
    PART_TORSO,      # 0  pelvis
    PART_LEFT_LEG,   # 1  left hip
    PART_RIGHT_LEG,  # 2  right hip
    PART_TORSO,      # 3  spine1
    PART_LEFT_LEG,   # 4  left knee
    PART_RIGHT_LEG,  # 5  right knee
    PART_TORSO,      # 6  spine2
    PART_LEFT_LEG,   # 7  left ankle
    PART_RIGHT_LEG,  # 8  right ankle
    PART_TORSO,      # 9  spine3
    PART_LEFT_LEG,   # 10 left foot
    PART_RIGHT_LEG,  # 11 right foot
    PART_HEAD,       # 12 neck
    PART_TORSO,      # 13 left collar
    PART_TORSO,      # 14 right collar
    PART_HEAD,       # 15 head
    PART_LEFT_ARM,   # 16 left shoulder
    PART_RIGHT_ARM,  # 17 right shoulder
    PART_LEFT_ARM,   # 18 left elbow
    PART_RIGHT_ARM,  # 19 right elbow
    PART_LEFT_ARM,   # 20 left wrist
    PART_RIGHT_ARM,  # 21 right wrist
    PART_LEFT_ARM,   # 22 left hand
    PART_RIGHT_ARM,  # 23 right hand
]

# DensePose 24-part -> LSP 6-part label map (reference
# utils/label_conversions.py:8-36).  Index = densepose class (1..24).
DENSEPOSE_TO_6PART = [
    0,  # 0: background
    6, 6, 2, 1, 4, 5, 5, 4, 5, 4, 5, 4, 5, 4, 1, 2, 1, 2, 1, 2, 1, 2, 3, 3,
]
