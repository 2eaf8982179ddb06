"""Model-level constants shared across the data pipeline and the MLLM.

Parity: /root/reference/src/constants.py:7-16 (sentinel ids and special-token
strings). The serving heartbeat constants of the reference are vestigial and
not reproduced.
"""

IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
TARGET_TOKEN_INDEX = -300

DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"
IMAGE_PLACEHOLDER = "<image-placeholder>"
DEFAULT_TARGET_TOKEN = "<target>"
