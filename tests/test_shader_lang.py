"""Shader language tests.

Numeric tests ported from the reference VM suites
(rusteria/src/lib.rs:270-297, src/vm/mod.rs:163-330 — string/match/host-call
tests live in the entity-VM suite) plus shader-specific coverage: swizzles,
registers, loops, procedural samples, the full wood shader, and
main.rusteria.
"""

import numpy as np
import pytest

from rusterix_tpu.shader import Program, Rusteria


def run_scalar(src: str) -> float:
    prog = Program(Rusteria.parse_str(src))
    _, last = prog.run()
    return float(np.asarray(last)[0])


def test_addition():
    # rusteria/src/lib.rs:272-277
    assert run_scalar("let a = 2; a + 2;") == 4.0


def test_fib():
    # rusteria/src/lib.rs:280-296 (fib(12) keeps inline depth tractable;
    # fib(27) runs on the host entity VM)
    src = """
    fn fib(n) {
        if n <= 1 {
            return n;
        } else {
            return fib(n - 1) + fib(n - 2);
        }
    }
    fib(12);
    """
    assert run_scalar(src) == 144.0


def test_ternary():
    assert run_scalar("let flag = 1; flag ? 10 : 20;") == 10.0
    assert run_scalar("let flag = 0; flag ? 10 : 20;") == 20.0


def test_swizzle_read_write():
    assert run_scalar("let v = vec3(1, 2, 3); v.z;") == 3.0
    assert run_scalar("let v = vec3(1, 2, 3); v.zyx.x;") == 3.0
    assert run_scalar("let v = vec3(1, 2, 3); v.x = 9; v.x;") == 9.0
    assert run_scalar("let v = vec3(1, 2, 3); v.xy = vec2(7, 8); v.y;") == 8.0


def test_vector_ops():
    assert run_scalar("dot(vec2(1, 2), vec2(3, 4));") == 11.0
    assert run_scalar("dot(vec3(1, 2, 3), vec3(1, 1, 1));") == 6.0
    assert run_scalar("length(vec2(3, 4));") == 5.0
    assert run_scalar("cross(vec3(1,0,0), vec3(0,1,0)).z;") == 1.0
    assert run_scalar("normalize(vec2(10, 0)).x;") == 1.0


def test_glsl_mod_and_fract():
    assert run_scalar("-1.5 % 1.0;") == 0.5
    assert run_scalar("fract(-0.25);") == 0.75


def test_intrinsics():
    assert run_scalar("clamp(5, 0, 1);") == 1.0
    assert run_scalar("mix(0, 10, 0.5);") == 5.0
    assert run_scalar("step(0.5, 0.7);") == 1.0
    assert run_scalar("smoothstep(0, 1, 0.5);") == 0.5
    assert abs(run_scalar("pow(2, 10);") - 1024.0) < 1e-3
    assert run_scalar("min(3, 4) + max(3, 4);") == 7.0
    assert run_scalar("floor(1.7) + ceil(1.2) + round(0.5);") == 1 + 2 + 1


def test_for_loop_static():
    src = """
    let total = 0;
    for (let i = 0; i < 6; i += 1) {
        total += i;
    }
    total;
    """
    assert run_scalar(src) == 15.0


def test_if_else_chain():
    src = """
    fn classify(x) {
        if x < 0 {
            return 0 - 1;
        } else if x == 0 {
            return 0;
        } else {
            return 1;
        }
    }
    classify(5) + classify(0) * 10 + classify(0-3);
    """
    assert run_scalar(src) == 0.0


def test_compound_assignment():
    assert run_scalar("let a = 10; a /= 2; a -= 1; a *= 3; a;") == 12.0


def test_shade_registers():
    prog = Program(
        Rusteria.parse_str(
            """
            fn shade() {
                color = vec3(uv.x, uv.y, 0.5);
                roughness = 0.25;
                opacity = 0.5;
            }
            """
        )
    )
    assert prog.shade_index
    assert prog.supports_opacity
    img = Rusteria.shade_image(prog, 8, 4)
    assert img.shape == (4, 8, 3)
    # color.x follows u
    assert img[0, 0, 0] < img[0, -1, 0]
    assert np.allclose(img[..., 2], 0.5)


def test_sample_patterns():
    prog = Program(
        Rusteria.parse_str(
            """
            fn shade() {
                let n = sample(uv * 4.0, "fbm_perlin");
                color = vec3(n.x, n.x, n.x);
            }
            """
        )
    )
    img = Rusteria.shade_image(prog, 16, 16)
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert img.std() > 0.01  # actually noisy


def test_wood_shader_compiles_and_runs():
    # the cube_shaded example shader (examples/cube_shaded.rs:46-102)
    src = """
    fn shade() {
        let t = time * 0.0;
        let uv2 = uv / 3.0 - vec2(1.5);
        let n1 = sample(uv2 + vec2(t, 0.0), "fbm_perlin");
        let n2 = sample(uv2 * 2.0 + vec2(0.0, t*0.7), "fbm_perlin");
        let turb = 0.65 * n1 + 0.35 * n2;
        let turb_zm = (turb - 0.5) * 2.0;
        let r = length(uv2);
        let ring_freq = 10.0;
        let ring_warp = 0.22;
        let rings = r + ring_warp * turb_zm;
        let waves = sin(rings * ring_freq);
        let rings_mask = pow(1.0 - abs(waves), 3.0);
        let grain_uv = vec2(uv2.x * 8.0, uv2.y * 40.0);
        let g = sample(grain_uv + vec2(0.0, t*0.5), "value");
        let grain = (g - 0.5) * 2.0;
        let base_light = vec3(0.72, 0.52, 0.32);
        let base_dark  = vec3(0.45, 0.30, 0.16);
        color = mix(base_light, base_dark, rings_mask);
        color *= (1.0 + 0.06 * grain);
        let band = uv2.y + 0.15 * turb_zm;
        let cathedral = pow(1.0 - abs(sin(band * 6.0)), 4.0);
        color = mix(color, color * 0.9, cathedral * 0.2);
        roughness = 0.6 + cathedral * 0.3;
    }
    """
    prog = Program(Rusteria.parse_str(src))
    img = Rusteria.shade_image(prog, 32, 32)
    assert img.shape == (32, 32, 3)
    assert img.min() >= 0.0
    # woody hues: red channel dominates blue
    assert img[..., 0].mean() > img[..., 2].mean()


def test_main_rusteria_compiles():
    # the repo's main.rusteria pavers shader (vectorized if/for path)
    with open("/root/reference/main.rusteria") as f:
        src = f.read()
    prog = Program(Rusteria.parse_str(src))
    img = Rusteria.shade_image(prog, 24, 24)
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()


def test_scene_add_shader():
    from rusterix_tpu import Scene

    scene = Scene.empty()
    idx = scene.add_shader("fn shade() { color = vec3(1, 0, 0); opacity = 0.5; }")
    assert idx == 0
    assert scene.shaders_with_opacity == [True]
    assert scene.add_shader("") is None
