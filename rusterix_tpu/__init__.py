"""rusterix_tpu — a TPU-native (JAX/XLA/Pallas) software rasterizer and retro
game engine with the capabilities of markusmoenig/Rusterix.

The public surface mirrors the reference's prelude (reference
src/lib.rs:181-211): Scene/Batch/Rasterizer/cameras/lights/textures plus the
game-engine layers (map, builders, server, client) as they land.
"""

__version__ = "0.1.0"

from .models import (  # noqa: F401
    Assets,
    Batch2D,
    Batch3D,
    CompiledLight,
    CullMode,
    D3Camera,
    DaylightSimulation,
    D3FirstPCamera,
    D3IsoCamera,
    D3OrbitCamera,
    GeometrySource,
    GridShader,
    HitInfo,
    Light,
    LightType,
    Material,
    MaterialModifier,
    MaterialRole,
    PixelSource,
    PixelSourceKind,
    PrimitiveMode,
    Ray,
    RenderSettings,
    RepeatMode,
    SampleMode,
    Scene,
    Shader,
    Texture,
    TextureAtlas,
    Tile,
    TileRole,
    VGrayGradientShader,
    Wavefront,
)
from .builders import (  # noqa: F401
    Chunk,
    D2Builder,
    D3Builder,
    MapScript,
    SceneManager,
    compile_source_map,
)
from .client import Client, Daylight, Draw2D, MsgParser  # noqa: F401
from .map import (  # noqa: F401
    CompiledLinedef,
    Linedef,
    Map,
    MapCamera,
    MapMini,
    Sector,
    Terrain,
    Value,
    ValueContainer,
    Vertex,
)
from .ops import PackedScene, Rasterizer  # noqa: F401
from .rusterix import DrawMode, Rusterix  # noqa: F401
from .server import (  # noqa: F401
    CollisionWorld,
    Entity,
    EntityAction,
    EntityActionKind,
    EntityUpdate,
    Item,
    PlayerCamera,
    RegionMessage,
    Wallet,
)
from .server.server import Server  # noqa: F401
from .shader import Program as ShaderProgram, Rusteria  # noqa: F401
from .vm import VM, VMValue  # noqa: F401
from .utils import (  # noqa: F401
    BLACK,
    TRANSPARENT,
    WHITE,
    Rect,
    hash_u32,
    pixel_to_vec4,
    vec4_to_pixel,
)
