"""Screen-map UI flow: start_screen init, widget roles from sector TOML,
button intent/show/hide/deactivate dispatch, composition
(reference client/mod.rs:795-906, 1300-1360, 1498-1760)."""

import numpy as np

from rusterix_tpu.client import Client, align_screen_to_grid
from rusterix_tpu.map import Map
from rusterix_tpu.models import Assets

VW, VH = 320, 200
GRID = 32.0


def add_rect_sector(m, x0, y0, x1, y1, data=None, name=""):
    a = m.add_vertex_at(x0, y0)
    b = m.add_vertex_at(x1, y0)
    c = m.add_vertex_at(x1, y1)
    d = m.add_vertex_at(0 + x0, y1)
    m.create_linedef(a, b)
    m.create_linedef(b, c)
    m.create_linedef(c, d)
    _, sid = m.create_linedef(d, a)
    sector = m.find_sector(sid)
    if data is not None:
        sector.properties.set("data", data)
    sector.name = name
    return sector


def screen_assets():
    assets = Assets.default()
    screen = Map()
    add_rect_sector(screen, -5, -3, 5, 3, '[ui]\nrole = "game"\n')
    attack = add_rect_sector(
        screen, 0, 0, 2, 1,
        '[ui]\nrole = "button"\nintent = "attack"\ndeactivate = ["talk"]\n',
        name="attack",
    )
    # disjoint corners: same-winding shared vertices can't auto-close
    # (the reference BFS skips the new edge's winding too, mod.rs:786-830)
    talk = add_rect_sector(
        screen, 2.5, 0, 4, 1,
        '[ui]\nrole = "button"\nintent = "talk"\nactive = true\n'
        'deactivate = ["attack"]\nhide = ["hint"]\n',
        name="talk",
    )
    add_rect_sector(
        screen, -4.8, 2.1, -0.2, 2.9,
        '[ui]\nrole = "text"\ntext = "hint"\nlayer = 2\n',
    )
    add_rect_sector(screen, 0.2, 2.1, 4.8, 2.9, '[ui]\nrole = "messages"\n')
    assets.screens["hud"] = screen
    assets.config = (
        f"[viewport]\nwidth = {VW}\nheight = {VH}\ngrid_size = {GRID}\n"
        '[game]\nstart_screen = "hud"\nauto_create_player = false\n'
    )
    return assets, attack.id, talk.id


def test_align_screen_to_grid():
    assert align_screen_to_grid(320, 200, 32.0) == (-5.0, -3.125)


def test_setup_initializes_start_screen():
    assets, attack_id, talk_id = screen_assets()
    client = Client()
    client.setup(assets)
    assert client.current_screen == "hud"
    assert len(client.game_widgets) == 1
    assert set(client.button_widgets) == {attack_id, talk_id}
    assert len(client.text_widgets) == 1
    assert client.messages_widget is not None
    assert client.screen_widget is not None
    # active=true button starts activated and applies its hide list
    assert talk_id in client.activated_widgets
    assert client.widgets_to_hide == ["hint"]
    # layer TOML propagated to the sector property
    screen = assets.screens["hud"]
    text_sector = [s for s in screen.sectors if s.properties.get("data") and "text" in s.properties.get("data").data][0]
    assert text_sector.properties.get_int_default("layer", 0) == 2


def test_button_rect_placement():
    assets, attack_id, _ = screen_assets()
    client = Client()
    client.setup(assets)
    btn = client.button_widgets[attack_id]
    # sector (0,0)-(2,1) with start (-5,-3.125): x = 5*32 = 160, y = 3.125*32 = 100
    assert btn.rect.x == 160.0 and btn.rect.y == 100.0
    assert btn.rect.width == 64.0 and btn.rect.height == 32.0


def test_touch_dispatch_intent_and_deactivate():
    assets, attack_id, talk_id = screen_assets()
    client = Client()
    client.setup(assets)
    btn = client.button_widgets[attack_id]
    result = client.touch_screen(btn.rect.x + 5, btn.rect.y + 5)
    assert result == ("intent", "attack")
    assert client.intent == "attack"
    assert attack_id in client.activated_widgets
    # deactivate=["talk"] cleared the talk button's activation
    assert talk_id not in client.activated_widgets
    assert attack_id in client.permanently_activated_widgets
    # miss: outside all buttons
    assert client.touch_screen(0, 0) is None


def test_show_clears_hidden():
    assets, attack_id, talk_id = screen_assets()
    client = Client()
    client.setup(assets)
    assert client.widgets_to_hide == ["hint"]
    client.button_widgets[attack_id].show = ["hint"]
    btn = client.button_widgets[attack_id]
    client.touch_screen(btn.rect.x + 1, btn.rect.y + 1)
    assert client.widgets_to_hide == []


def test_draw_game_composes_screen():
    assets, attack_id, talk_id = screen_assets()
    client = Client()
    client.setup(assets)
    frame = client.draw_game(VW, VH, assets)
    assert frame.shape == (VH, VW, 4)
    # activated talk button outline drew something
    btn = client.button_widgets[talk_id]
    ys = int(btn.rect.y)
    xs = int(btn.rect.x)
    assert frame[ys : ys + int(btn.rect.height), xs : xs + int(btn.rect.width)].any()


def test_game_font_reaches_text_widget(tmp_path):
    """collect_from_directory picks up .ttf files into Assets.fonts, the
    screen's text widget resolves `font = "name"` through them, and the
    rendered glyphs differ from the system default (draw2d.rs:617+ `&Font`
    params; assets.rs fonts map)."""
    import shutil

    shutil.copy(
        "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
        tmp_path / "gamefont.ttf",
    )
    assets = Assets.default()
    assets.collect_from_directory(str(tmp_path))
    assert assets.fonts["gamefont"].endswith("gamefont.ttf")

    screen = Map()
    add_rect_sector(screen, -5, -3, 5, 3, '[ui]\nrole = "game"\n')
    add_rect_sector(
        screen, -4.8, 2.1, -0.2, 2.9,
        '[ui]\nrole = "text"\ntext = "Hello"\nfont = "gamefont"\n',
    )
    assets.screens["hud"] = screen
    assets.config = (
        f"[viewport]\nwidth = {VW}\nheight = {VH}\ngrid_size = {GRID}\n"
        '[game]\nstart_screen = "hud"\nauto_create_player = false\n'
    )
    client = Client()
    client.setup(assets)
    (widget,) = client.text_widgets.values()
    assert widget.font == assets.fonts["gamefont"]

    buf_game = np.zeros((VH, VW, 4), np.uint8)
    widget.draw(buf_game)
    assert buf_game.any()
    widget.font = None  # system default renders different glyph shapes
    buf_sys = np.zeros((VH, VW, 4), np.uint8)
    widget.draw(buf_sys)
    assert (buf_game != buf_sys).any()
