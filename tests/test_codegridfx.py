"""codegridfx: visual code grid -> rusteria source generation
(reference codegridfx/lib/src/{cell,grid,routine,module}.rs). The generated
source must parse and run in the entity VM / shader compiler."""

from rusterix_tpu.codegridfx import (
    AssignmentOp,
    Cell,
    CellItem,
    CellItemForm,
    ComparisonOp,
    Module,
    ModuleType,
    Routine,
    is_valid_code_variable,
)
from rusterix_tpu.vm import VM, HostHandler, VMValue


def arg(kind, value, desc):
    return CellItem(cell=Cell(kind, value), description=desc)


def fn_cell(name, has_args=True):
    return CellItem(
        cell=Cell(name),
        form=CellItemForm.RightRounded if has_args else CellItemForm.Rounded,
    )


def test_cell_codes():
    assert Cell("Variable", "myself").to_code() == "id()"
    assert Cell("Variable", "hp").to_code() == "hp"
    assert Cell("Str", "hi").to_code() == '"hi"'
    assert Cell("Boolean", True).to_code() == "true"
    assert Cell("PaletteColor", 3).to_code() == "palette(3)"
    assert Cell("Comparison", ComparisonOp.NotEqual).to_code() == "!="
    assert Cell("SetAttr").to_code() == "set_attr"
    assert Cell("Smoothstep").to_code() == "smoothstep"
    assert CellItem(cell=Cell("Assignment"), option=AssignmentOp.AddAssign).code() == "+="
    assert CellItem(cell=Cell("Variable", "items"), option=2).code() == "len(items)"
    assert is_valid_code_variable("a_b.c") and not is_valid_code_variable("1x")


def test_template_event_codegen_and_vm_roundtrip():
    m = Module.as_type(ModuleType.CharacterTemplate)
    r = m.add_routine("startup")
    # row 0: health = 10
    r.grid.insert((0, 0), CellItem(cell=Cell("Variable", "health")))
    r.grid.insert((1, 0), CellItem(cell=Cell("Assignment")))
    r.grid.insert((2, 0), CellItem(cell=Cell("Integer", "10")))
    # row 1: if health == 10 {
    r.grid.insert((0, 1), CellItem(cell=Cell("If")))
    r.grid.insert((1, 1), CellItem(cell=Cell("Variable", "health")))
    r.grid.insert((2, 1), CellItem(cell=Cell("Comparison", ComparisonOp.Equal)))
    r.grid.insert((3, 1), CellItem(cell=Cell("Integer", "10")))
    # row 2 (indented): message("ready")
    r.grid.insert((0, 2), fn_cell("Message"))
    r.grid.insert((1, 2), arg("Str", "ready", "text"))
    r.grid.set_row_indent(2, 1)

    src = m.build()
    assert 'if event == "startup" {' in src
    assert "let health = 10;" in src
    assert "if health == 10{" in src  # reference spacing: routine.rs:644-649
    assert 'message( "ready")' in src
    assert src.count("{") == src.count("}")

    # run through the entity VM: host receives the message call
    calls = []

    class H(HostHandler):
        def on_host_call(self, name, args, vm):
            calls.append((name, [a.as_string() for a in args]))
            return VMValue.zero()

    vm = VM()
    vm.compile(vm.parse_str(src))
    ex = vm.new_execution(H())
    ex.execute_function(
        [VMValue.from_string("startup"), VMValue.zero()], "event"
    )
    assert ("message", ["ready"]) in calls


def test_user_events_split_into_user_event_fn():
    m = Module.as_type(ModuleType.CharacterTemplate)
    r = m.add_routine("key_down")
    r.grid.insert((0, 0), fn_cell("Action"))
    r.grid.insert((1, 0), CellItem(cell=Cell("Variable", "key"), description="cmd"))
    src = m.build()
    assert "fn user_event(event, value) {" in src
    assert 'if event == "key_down" {' in src
    assert "let key = value;" in src
    assert "action( key)" in src
    # the event fn exists too (empty)
    assert "fn event(event, value) {" in src


def test_intent_routine_prefix():
    m = Module.as_type(ModuleType.CharacterTemplate)
    m.add_routine("intent: attack")
    src = m.build()
    assert 'if event == "intent" && value == "attack" {' in src


def test_instance_setup_codegen():
    m = Module.as_type(ModuleType.CharacterInstance)
    r = m.add_routine("instantiation")
    r.grid.insert((0, 0), fn_cell("SetAttr"))
    r.grid.insert((1, 0), arg("Str", "name", "key"))
    r.grid.insert((2, 0), arg("Str", "Bob", "value"))
    src = m.build()
    assert src.startswith("fn setup() {")
    assert 'set_attr( "name",  "Bob")' in src


def test_shader_module_codegen_compiles():
    m = Module.as_type(ModuleType.Shader)
    r = m.add_routine("shader")
    r.scale = 2.0
    r.pixelization = 8
    r.color_steps = 4
    # color = mix(color, palette(1), 0.5)
    r.grid.insert((0, 0), CellItem(cell=Cell("Variable", "color")))
    r.grid.insert((1, 0), CellItem(cell=Cell("Assignment")))
    r.grid.insert((2, 0), fn_cell("Mix"))
    r.grid.insert((3, 0), arg("Variable", "color", "a"))
    r.grid.insert((4, 0), arg("PaletteColor", 1, "b"))
    r.grid.insert((5, 0), arg("Float", "0.5", "t"))
    src = m.build_shader()
    assert src.startswith("fn shade() {")
    assert "uv /= 2.0;" in src
    assert "uv = floor(uv * 8) / 8;" in src
    assert "color = mix( color,  palette(1),  0.5)" in src
    assert "color = floor(color * 4) / 4;" in src

    from rusterix_tpu.shader import Rusteria

    prog = Rusteria.parse_and_compile(src)
    assert prog is not None and prog.shade_index


def test_json_round_trip():
    m = Module.as_type(ModuleType.CharacterTemplate)
    m.name = "guard"
    r = m.add_routine("startup")
    r.grid.insert((0, 0), fn_cell("RandomWalk"))
    r.grid.insert((1, 0), arg("Float", "1.0", "distance"))
    r.grid.set_row_indent(0, 0)
    m2 = Module.from_json(m.to_json())
    assert m2.name == "guard"
    assert m2.build() == m.build()


def test_tile_module_regenerates_frames():
    """Tile.module closes the shader-tile authoring loop (tile.rs:88-89):
    attaching a codegridfx shader module bakes the tile's frames from the
    generated rusteria source, and editing the module + regenerating
    changes the pixels."""
    import numpy as np

    from rusterix_tpu.models import Texture, Tile

    m = Module.as_type(ModuleType.Shader)
    r = m.add_routine("shader")
    r.grid.insert((0, 0), CellItem(cell=Cell("Variable", "color")))
    r.grid.insert((1, 0), CellItem(cell=Cell("Assignment")))
    r.grid.insert((2, 0), fn_cell("Mix"))
    r.grid.insert((3, 0), arg("Variable", "color", "a"))
    r.grid.insert((4, 0), arg("PaletteColor", 1, "b"))
    r.grid.insert((5, 0), arg("Float", "0.5", "t"))

    from rusterix_tpu.models.assets import default_palette

    pal = default_palette()
    tile = Tile.from_texture(Texture.checkerboard(8, 2))
    tile.set_module(m, frames=2, size=16, palette=pal)
    assert tile.module is m
    assert len(tile.textures) == 2
    assert tile.textures[0].data.shape == (16, 16, 4)
    first = tile.textures[0].data.copy()
    assert first[..., :3].any(), "bake produced a black tile"

    # edit the module (mix toward a different palette color) and regenerate
    r.grid.insert((4, 0), arg("PaletteColor", 3, "b"))
    assert tile.regenerate_from_module(size=16, palette=pal)
    assert len(tile.textures) == 2  # frame count preserved
    assert not np.array_equal(tile.textures[0].data, first)

    # module rides through resized() clones (tile.rs:180)
    assert tile.resized(8, 8).module is m


def test_tile_without_module_regenerate_is_noop():
    from rusterix_tpu.models import Texture, Tile

    tile = Tile.from_texture(Texture.checkerboard(8, 2))
    before = [t.data.copy() for t in tile.textures]
    assert tile.regenerate_from_module() is False
    assert len(tile.textures) == len(before)
