from rtf_tpu.scene.model import (  # noqa: F401
    SceneDesc, NodeDesc, CameraDesc, LightDesc, MaterialDesc,
    TexturedColorDesc, TexMapDesc, TextureDesc, MeshDesc,
)
from rtf_tpu.scene.xml_loader import load_scene  # noqa: F401
from rtf_tpu.scene.build import build_scene, GpuScene  # noqa: F401
