"""Entity-VM language tests — ported verbatim from the reference spec suite
(src/vm/mod.rs:163-330)."""

from rusterix_tpu.vm import VM, Execution, HostHandler, VMValue


def test_addition():
    # vm/mod.rs:167-172
    result = VM().execute_string("let a = 2; a + 2;")
    assert result.x == 4.0


def test_fib():
    # vm/mod.rs:174-189 — fib(27) == 196418
    fib = """
    fn fib(n) {
        if n <= 1 {
            return n;
        } else {
            return fib(n - 1) + fib(n - 2);
        }
    }
    fib(27);
    """
    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(100000)
    try:
        result = VM().execute_string(fib)
    finally:
        sys.setrecursionlimit(old)
    assert result.x == 196418.0


def test_string_literal():
    # vm/mod.rs:191-199
    result = VM().execute_string('let greeting = "hello"; greeting;')
    assert result.as_string() == "hello"


def test_string_compare_literal():
    # vm/mod.rs:201-210
    result = VM().execute_string('let name = "abc"; name == "abc";')
    assert result.x == 1.0


def test_ternary_string():
    # vm/mod.rs:212-220
    result = VM().execute_string('let flag = 1; flag ? "yes" : "no";')
    assert result.as_string() == "yes"


def test_user_event_invocation():
    # vm/mod.rs:222-248
    vm = VM()
    module = vm.parse_str(
        """
        fn user_event(event, value) {
            // no-op handler
        }
        """
    )
    program = vm.compile(module)
    func_index = program.user_functions_name_map["user_event"]
    ex = vm.new_execution()
    result = ex.execute_function(
        [VMValue.broadcast(1.0), VMValue.broadcast(2.0)], func_index
    )
    assert result.x == 0.0


def test_match_syntax_event():
    # vm/mod.rs:250-307
    vm = VM()
    module = vm.parse_str(
        """
        fn user_event(event, value) {
            match event {
                "key_down" {
                    if value == "w" {
                        action("forward");
                    }
                }
                "key_up" {
                    action("none");
                }
                _ {
                    action("noop");
                }
            }
        }
        """
    )
    program = vm.compile(module)
    func_index = program.user_functions_name_map["user_event"]

    ex = vm.new_execution()
    ex.execute_function(
        [VMValue.from_string("key_down"), VMValue.from_string("w")], func_index
    )
    assert ex.outputs["action"].as_string() == "forward"

    ex2 = vm.new_execution()
    ex2.execute_function(
        [VMValue.from_string("key_up"), VMValue.from_string("w")], func_index
    )
    assert ex2.outputs["action"].as_string() == "none"

    ex3 = vm.new_execution()
    ex3.execute_function(
        [VMValue.from_string("other"), VMValue.from_string("w")], func_index
    )
    assert ex3.outputs["action"].as_string() == "noop"


def test_format_variadic():
    # vm/mod.rs:309-317
    result = VM().execute_string('format("pos {} {}", 1, 2);')
    assert result.as_string() == "pos 1 2"


def test_print_multiple_args():
    # vm/mod.rs:319-326
    vm = VM()
    host = HostHandler()
    result = vm.execute_string('print("hello", 1, 2); "done";', host=host)
    assert result.as_string() == "done"


def test_host_call_seam():
    class Recorder(HostHandler):
        def __init__(self):
            super().__init__()
            self.calls = []

        def on_host_call(self, name, args, vm):
            self.calls.append((name, [a.display() for a in args]))
            return VMValue.broadcast(42.0)

    host = Recorder()
    result = VM().execute_string('let v = goto(3, 4); v;', host=host)
    assert host.calls == [("goto", ["3", "4"])]
    assert result.x == 42.0


def test_while_and_break():
    src = """
    let i = 0;
    let total = 0;
    while 1 {
        total += i;
        i += 1;
        if i >= 5 { break; }
    }
    total;
    """
    assert VM().execute_string(src).x == 10.0
