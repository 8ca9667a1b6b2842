"""DebugData streaming: per-cell values captured during script execution in
debug mode and sent to the server (reference codegridfx/lib/src/
debugmodule.rs:4-101 + src/server/region.rs:1070-1075, 2514)."""

from rusterix_tpu.codegridfx import Cell, CellItem, CellItemForm, Module, ModuleType
from rusterix_tpu.codegridfx.debugmodule import DebugModule
from rusterix_tpu.map.worldmap import Map
from rusterix_tpu.server.message import RegionMessageKind
from rusterix_tpu.server.region import RegionInstance
from rusterix_tpu.server.server import Server


def _grid_module_source() -> str:
    """A code-grid Character module whose startup sends a message — compiled
    WITH debug locations injected before every function cell."""
    m = Module.as_type(ModuleType.CharacterTemplate)
    r = m.add_routine("startup")
    r.grid.insert(
        (0, 0), CellItem(cell=Cell("Message"), form=CellItemForm.RightRounded)
    )
    r.grid.insert(
        (1, 0), CellItem(cell=Cell("Str", "hello"), description="text")
    )
    return m.build(debug=True)


def _region_with_script(src: str, debug: bool) -> RegionInstance:
    inst = RegionInstance(0, "world")
    inst.init(Map(), {"Npc": (src, "")}, {})
    inst.set_debug_mode(debug)
    from rusterix_tpu.server.entity import Entity

    e = Entity()
    e.set_attribute("class_name", "Npc")
    inst.spawn_entity(e)
    return inst


def test_debug_module_value_capture_roundtrip():
    src = _grid_module_source()
    assert "set_debug_loc(" in src

    inst = _region_with_script(src, debug=True)
    e = inst.ctx.entities[0]
    inst.run_entity_event(e, "startup", None)

    # the Message cell at (0, 0) of routine "startup" captured "Ok"
    val = inst.ctx.debug.get_value(e.id, "startup", 0, 0)
    assert val == "Ok", inst.ctx.debug

    # debug off: nothing is captured
    inst2 = _region_with_script(src, debug=False)
    e2 = inst2.ctx.entities[0]
    inst2.run_entity_event(e2, "startup", None)
    assert inst2.ctx.debug.ids == {}


def test_debug_data_streams_to_server():
    src = _grid_module_source()
    inst = _region_with_script(src, debug=True)
    inst.running = True
    e = inst.ctx.entities[0]
    inst.run_entity_event(e, "startup", None)

    server = Server()
    server.instances.append(inst)
    server.entities[0] = []
    server.items[0] = []
    inst.system_tick()
    server.update()

    assert server.debug_changed
    module = server.debug_modules.get(0)
    assert module is not None
    assert module.get_value(e.id, "startup", 0, 0) == "Ok"


def test_debug_module_merge_and_errors():
    a = DebugModule()
    a.add_value(1, "startup", 0, 0, "Ok")
    a.add_error(1, "startup", 2, 0)
    b = DebugModule()
    b.add_value(1, "startup", 0, 0, "Changed")
    b.add_value(2, "event", 1, 1, 42)
    a.merge(b)
    assert a.get_value(1, "startup", 0, 0) == "Changed"
    assert a.get_value(2, "event", 1, 1) == 42
    assert (2, 0) in a.ensure_grid(1, "startup").errors
    a.remove_error(1, "startup", 2, 0)
    assert (2, 0) not in a.ensure_grid(1, "startup").errors
    a.clear()
    assert a.ids == {}
