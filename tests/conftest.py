import os

# Tests run on a virtual 8-device CPU mesh (the MGPU_EMU analogue —
# reference: src/Common/GPUplan.h:10-15 fakes 16 GPUs on one device).
#
# This box force-registers the remote-TPU PJRT plugin from sitecustomize
# whenever PALLAS_AXON_POOL_IPS is set; clearing it keeps tests off the
# (single, contended) TPU tunnel entirely.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)
