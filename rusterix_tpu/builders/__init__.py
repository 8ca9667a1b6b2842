from .chunk import CHUNK_SIZE, BillboardMetadata, Chunk, ChunkCollision
from .d2builder import D2Builder
from .d2preview import D2PreviewBuilder
from .d3builder import D3Builder, resolve_source
from .mapscript import MapScript, compile_source_map
from .scenemanager import (
    SceneManager,
    SceneManagerCmd,
    SceneManagerCmdKind,
    SceneManagerResult,
)

__all__ = [
    "CHUNK_SIZE",
    "BillboardMetadata",
    "Chunk",
    "ChunkCollision",
    "D2Builder",
    "D2PreviewBuilder",
    "D3Builder",
    "resolve_source",
    "MapScript",
    "compile_source_map",
    "SceneManager",
    "SceneManagerCmd",
    "SceneManagerCmdKind",
    "SceneManagerResult",
]
