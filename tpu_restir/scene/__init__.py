from tpu_restir.scene.materials import MaterialTable, MatType  # noqa: F401
from tpu_restir.scene.scene import SceneArrays, build_scene  # noqa: F401
from tpu_restir.scene.cornell import cornell_box, many_lights_scene  # noqa: F401
