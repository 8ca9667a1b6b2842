"""Message token parser (reference src/client/parser.rs).

Grammar: `{...}` tokens inside messages —
  {the,case=upper}            text key + options
  {E:20.name,article=def}     entity attribute
  {It:102.name,article=indef} item attribute
  {N:50,unit=hp}              integer
  {F:3.14,precision=2}        float
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class Tok:
    kind: str  # 'text', 'entity', 'item', 'num', 'float', 'plain'
    text: str = ""
    id: int = 0
    attr: str = ""
    val: float = 0.0
    opts: Dict[str, str] = field(default_factory=dict)


_BRACE_RE = re.compile(r"\{([^{}]+)\}")

#: EnLocale article tables (resolver.rs:20-60)
_AN_EXCEPTIONS = ("honest", "honor", "honour", "hour", "heir")
_A_EXCEPTIONS = ("uni", "use", "euro", "one")  # unicorn, user, euro, one-off
_PAIR_ITEMS = ("trousers", "pants", "gloves", "boots", "scissors", "goggles")
_MASS_ITEMS = (
    "armor", "cloth", "water", "meat", "sand", "rice", "bread", "equipment",
)


def _indefinite_article(word: str) -> str:
    """EnLocale::indefinite_article (resolver.rs:21-41)."""
    if not word:
        return "a"
    if word.startswith(_AN_EXCEPTIONS):
        return "an"
    if word.startswith(_A_EXCEPTIONS):
        return "a"
    return "an" if word[:1].lower() in "aeiou" else "a"


def _with_article(name: str, opts: Dict[str, str]) -> str:
    """EnLocale::with_article_item/_entity (resolver.rs:62-90): definite ->
    'the X'; indefinite -> 'a pair of X' for pair items, 'some X' for mass
    nouns, else 'a/an X' with the exception tables above."""
    article = opts.get("article")
    if article is None:
        return name
    article = article.lower()
    if article in ("def", "definite"):
        return f"the {name}"
    if article in ("indef", "indefinite", "undef"):
        lower = name.lower()
        if any(p in lower for p in _PAIR_ITEMS):
            return f"a pair of {name}"
        if any(m in lower for m in _MASS_ITEMS):
            return f"some {name}"
        return f"{_indefinite_article(lower)} {name}"
    return name


class MsgParser:
    def parse(self, input_str: str) -> List[Tok]:
        toks: List[Tok] = []
        last = 0
        for m in _BRACE_RE.finditer(input_str):
            if m.start() > last:
                toks.append(Tok("plain", text=input_str[last : m.start()]))
            toks.append(self._parse_token(m.group(1)))
            last = m.end()
        if last < len(input_str):
            toks.append(Tok("plain", text=input_str[last:]))
        return toks

    def _parse_token(self, body: str) -> Tok:
        parts = body.split(",")
        head = parts[0].strip()
        opts = {}
        for p in parts[1:]:
            if "=" in p:
                k, v = p.split("=", 1)
                opts[k.strip()] = v.strip()
        lower = head.lower()
        if lower.startswith("e:"):
            id_attr = head[2:].split(".", 1)
            return Tok(
                "entity",
                id=int(id_attr[0]),
                attr=id_attr[1] if len(id_attr) > 1 else "name",
                opts=opts,
            )
        # item refs: I: / It: / Item:, case-insensitive (parser.rs:76-84) —
        # region.rs:1323 emits the short {I:<id>.name} form on purchases
        for prefix in ("item:", "it:", "i:"):
            if lower.startswith(prefix):
                id_attr = head[len(prefix):].split(".", 1)
                return Tok(
                    "item",
                    id=int(id_attr[0]),
                    attr=id_attr[1] if len(id_attr) > 1 else "name",
                    opts=opts,
                )
        if head.startswith("N:"):
            return Tok("num", val=float(int(head[2:])), opts=opts)
        if head.startswith("F:"):
            return Tok("float", val=float(head[2:]), opts=opts)
        return Tok("text", text=head, opts=opts)

    def render(
        self,
        input_str: str,
        entities=None,
        items=None,
        locale: Optional[Dict[str, str]] = None,
    ) -> str:
        """Expand tokens to display text."""

        def apply_case(text: str, opts: Dict[str, str]) -> str:
            case = (opts.get("case") or "").lower()
            if case == "upper":
                return text.upper()
            if case == "lower":
                return text.lower()
            return text

        out = []
        for tok in self.parse(input_str):
            if tok.kind == "plain":
                out.append(tok.text)
            elif tok.kind == "text":
                out.append(
                    apply_case((locale or {}).get(tok.text, tok.text), tok.opts)
                )
            elif tok.kind == "entity":
                name = ""
                for e in entities or []:
                    if e.id == tok.id:
                        name = e.attributes.get_str_default(tok.attr, "")
                        break
                out.append(apply_case(_with_article(name, tok.opts), tok.opts))
            elif tok.kind == "item":
                # world items first, then entity inventories
                # (resolver.rs:156-186)
                name = ""
                for i in items or []:
                    if i.id == tok.id:
                        name = i.attributes.get_str_default(tok.attr, "")
                        break
                if not name:
                    for e in entities or []:
                        for _, inv_item in e.iter_inventory():
                            if inv_item.id == tok.id:
                                name = inv_item.attributes.get_str_default(
                                    tok.attr, ""
                                )
                                break
                        if name:
                            break
                out.append(apply_case(_with_article(name, tok.opts), tok.opts))
            elif tok.kind == "num":
                text = f"{int(tok.val)}"
                if "unit" in tok.opts:
                    text += f" {tok.opts['unit']}"
                out.append(text)
            elif tok.kind == "float":
                prec = int(tok.opts.get("precision", 2))
                out.append(f"{tok.val:.{prec}f}")
        return "".join(out)
