"""Pure-Python XSD-subset validator for the Pure sync schemas.

The reference ships the XML schemas its sync files must satisfy
(docs/person.xsd, docs/user.xsd, docs/commons.xsd) but never validates
against them in code — correctness rests on the Jinja templates alone
(experts_etl/templates/*.xml.j2).  Here rendered documents are checked
against the schemas directly.  No lxml/xmlschema in the image, so this
implements exactly the XSD subset those three schemas use:

- global elements, named complex/simple types, cross-namespace import
- ``sequence`` / ``all`` / ``choice`` content models with nested
  particles and minOccurs/maxOccurs
- ``simpleContent``/``complexContent`` extensions (text + attributes,
  base-type inheritance)
- simple-type restrictions: maxLength, pattern, enumeration,
  fractionDigits, min/maxInclusive, plus the builtins the schemas
  reference (string, boolean, date, decimal, float, anyURI)

Deterministic (UPA-conforming) schemas allow the greedy, no-backtrack
matcher used here.  Driver-side, test-time tool — the engine's hot path
never parses XML it just produced.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

XS = "http://www.w3.org/2001/XMLSchema"
_UNBOUNDED = 1 << 30


def _q(tag: str) -> str:
    return f"{{{XS}}}{tag}"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _ns_of(tag: str) -> str:
    return tag[1:].split("}", 1)[0] if tag.startswith("{") else ""


@dataclass
class SimpleType:
    base: tuple[str, str] | None = None  # (ns, name) or None
    max_length: int | None = None
    patterns: list[str] | None = None  # OR-semantics (multiple facets)
    enumeration: list[str] | None = None
    fraction_digits: int | None = None
    min_inclusive: float | None = None
    max_inclusive: float | None = None


@dataclass
class Attr:
    name: str
    type_ref: tuple[str, str] | None
    required: bool


@dataclass
class Particle:
    kind: str  # "element" | "sequence" | "choice" | "all"
    min: int = 1
    max: int = 1
    # element particles:
    qname: str | None = None  # "{ns}local"
    type_ref: tuple[str, str] | None = None
    inline_type: object = None
    ref: tuple[str, str] | None = None
    # group particles:
    items: list["Particle"] = field(default_factory=list)


@dataclass
class ComplexType:
    particle: Particle | None = None  # content model (None = empty)
    attrs: list[Attr] = field(default_factory=list)
    text_type: tuple[str, str] | None = None  # simpleContent base
    base: tuple[str, str] | None = None  # complexContent extension base


class XsdSchema:
    """Schemas merged across imports, keyed by target namespace."""

    def __init__(self) -> None:
        self.elements: dict[tuple[str, str], Particle] = {}
        self.types: dict[tuple[str, str], object] = {}
        # element key -> its substitutionGroup head key
        self.subst_head: dict[tuple[str, str], tuple[str, str]] = {}

    # -- parsing ---------------------------------------------------------

    @classmethod
    def load(cls, *paths: str) -> "XsdSchema":
        self = cls()
        for p in paths:
            self._parse_file(p)
        return self

    def _parse_file(self, path: str) -> None:
        root = ET.parse(path).getroot()
        tns = root.get("targetNamespace", "")
        # prefix -> namespace map for resolving QName attribute values
        nsmap = {"": ""}
        for _, (prefix, uri) in ET.iterparse(path, events=["start-ns"]):
            nsmap[prefix] = uri

        def resolve(qname: str | None) -> tuple[str, str] | None:
            if qname is None:
                return None
            prefix, _, local = qname.rpartition(":")
            return (nsmap.get(prefix, ""), local)

        def parse_simple(node) -> SimpleType:
            st = SimpleType()
            restr = node.find(_q("restriction"))
            if restr is not None:
                st.base = resolve(restr.get("base"))
                for facet in restr:
                    f, v = _local(facet.tag), facet.get("value")
                    if f == "maxLength":
                        st.max_length = int(v)
                    elif f == "pattern":
                        st.patterns = (st.patterns or []) + [v]
                    elif f == "enumeration":
                        st.enumeration = (st.enumeration or []) + [v]
                    elif f == "fractionDigits":
                        st.fraction_digits = int(v)
                    elif f == "minInclusive":
                        st.min_inclusive = float(v)
                    elif f == "maxInclusive":
                        st.max_inclusive = float(v)
            return st

        def parse_attr(node) -> Attr:
            return Attr(
                name=node.get("name"),
                type_ref=resolve(node.get("type")),
                required=node.get("use") == "required",
            )

        def parse_particle(node) -> Particle:
            kind = _local(node.tag)
            mn = int(node.get("minOccurs", "1"))
            mx_s = node.get("maxOccurs", "1")
            mx = _UNBOUNDED if mx_s == "unbounded" else int(mx_s)
            if kind == "element":
                p = Particle("element", mn, mx)
                if node.get("ref"):
                    p.ref = resolve(node.get("ref"))
                else:
                    p.qname = f"{{{tns}}}{node.get('name')}"
                    p.type_ref = resolve(node.get("type"))
                    inline_ct = node.find(_q("complexType"))
                    inline_st = node.find(_q("simpleType"))
                    if inline_ct is not None:
                        p.inline_type = parse_complex(inline_ct)
                    elif inline_st is not None:
                        p.inline_type = parse_simple(inline_st)
                return p
            p = Particle(kind, mn, mx)
            for child in node:
                if _local(child.tag) in ("element", "sequence", "choice", "all"):
                    p.items.append(parse_particle(child))
            return p

        def parse_complex(node) -> ComplexType:
            ct = ComplexType()
            for child in node:
                tag = _local(child.tag)
                if tag in ("sequence", "choice", "all"):
                    ct.particle = parse_particle(child)
                elif tag == "attribute":
                    ct.attrs.append(parse_attr(child))
                elif tag == "simpleContent":
                    ext = child.find(_q("extension"))
                    ct.text_type = resolve(ext.get("base"))
                    ct.attrs.extend(parse_attr(a) for a in ext.findall(_q("attribute")))
                elif tag == "complexContent":
                    ext = child.find(_q("extension"))
                    ct.base = resolve(ext.get("base"))
                    for sub in ext:
                        t = _local(sub.tag)
                        if t in ("sequence", "choice", "all"):
                            ct.particle = parse_particle(sub)
                        elif t == "attribute":
                            ct.attrs.append(parse_attr(sub))
            return ct

        for child in root:
            tag = _local(child.tag)
            name = child.get("name")
            if tag == "element":
                self.elements[(tns, name)] = parse_particle(child)
                if child.get("substitutionGroup"):
                    self.subst_head[(tns, name)] = resolve(
                        child.get("substitutionGroup")
                    )
            elif tag == "complexType":
                self.types[(tns, name)] = parse_complex(child)
            elif tag == "simpleType":
                self.types[(tns, name)] = parse_simple(child)

    # -- validation ------------------------------------------------------

    def validate(self, elem: ET.Element) -> list[str]:
        """Validate an element tree against its global element decl;
        returns a list of human-readable errors (empty = valid)."""
        errors: list[str] = []
        key = (_ns_of(elem.tag), _local(elem.tag))
        decl = self.elements.get(key)
        if decl is None:
            return [f"no global element declaration for {elem.tag}"]
        self._validate_element(elem, decl, errors, _local(elem.tag))
        return errors

    def assert_valid(self, xml_text: str) -> None:
        errs = self.validate(ET.fromstring(xml_text))
        if errs:
            raise AssertionError("XSD violations:\n" + "\n".join(errs[:20]))

    def _type_of(self, p: Particle):
        if p.ref is not None:
            target = self.elements.get(p.ref)
            return self._type_of(target) if target is not None else None
        if p.inline_type is not None:
            return p.inline_type
        if p.type_ref is not None:
            if p.type_ref[0] == XS:
                return SimpleType(base=p.type_ref)
            return self.types.get(p.type_ref)
        return None  # anyType

    def _flat_complex(self, ct: ComplexType) -> ComplexType:
        """Resolve a complexContent extension chain into one type."""
        if ct.base is None:
            return ct
        base = self.types.get(ct.base)
        if not isinstance(base, ComplexType):
            return ct
        base = self._flat_complex(base)
        items = []
        for part in (base.particle, ct.particle):
            if part is not None:
                items.append(part)
        merged = ComplexType(
            particle=Particle("sequence", 1, 1, items=items) if items else None,
            attrs=base.attrs + ct.attrs,
            text_type=ct.text_type or base.text_type,
        )
        return merged

    def _validate_element(self, elem, decl: Particle, errors, path) -> None:
        typ = self._type_of(decl)
        if typ is None:
            return
        if isinstance(typ, SimpleType):
            if len(elem) or elem.attrib:
                errors.append(f"{path}: simple-typed element has children/attributes")
            self._check_simple(elem.text or "", typ, errors, path)
            return
        ct = self._flat_complex(typ)
        declared = {a.name: a for a in ct.attrs}
        for name, val in elem.attrib.items():
            a = declared.get(name)
            if a is None:
                errors.append(f"{path}: undeclared attribute '{name}'")
            elif a.type_ref is not None:
                self._check_simple(
                    val, self._simple(a.type_ref), errors, f"{path}/@{name}"
                )
        for a in ct.attrs:
            if a.required and a.name not in elem.attrib:
                errors.append(f"{path}: missing required attribute '{a.name}'")
        if ct.text_type is not None:
            if len(elem):
                errors.append(f"{path}: simpleContent element has child elements")
            self._check_simple(elem.text or "", self._simple(ct.text_type), errors, path)
            return
        children = list(elem)
        if ct.particle is None:
            if children:
                errors.append(f"{path}: content not allowed (empty type)")
            return
        i = self._match(ct.particle, children, 0, errors, path)
        if i is None:
            errors.append(f"{path}: content model not satisfied")
        elif i < len(children):
            errors.append(
                f"{path}: unexpected element <{_local(children[i].tag)}> at position {i}"
            )

    def _simple(self, ref: tuple[str, str]) -> SimpleType:
        if ref[0] == XS:
            return SimpleType(base=ref)
        t = self.types.get(ref)
        return t if isinstance(t, SimpleType) else SimpleType()

    # Greedy matcher: returns index after consuming the particle, or
    # None when minOccurs is unsatisfiable at this position.
    def _match(self, p: Particle, children, i, errors, path):
        count = 0
        while count < p.max and i < len(children) or (count < p.min):
            j = self._match_once(p, children, i, errors, path)
            if j is None:
                break
            if j == i:
                # Zero-width success (e.g. a choice whose branches are all
                # optional): the particle matched without consuming input,
                # which satisfies ANY minOccurs — repeating it would loop.
                return i
            i, count = j, count + 1
        return i if count >= p.min else None

    def _match_once(self, p: Particle, children, i, errors, path):
        if p.kind == "element":
            qname = p.qname
            if qname is None and p.ref is not None:
                target_ns, local = p.ref
                qname = f"{{{target_ns}}}{local}"
            if i >= len(children):
                return None
            child = children[i]
            if child.tag == qname:
                decl = self.elements.get(p.ref) if p.ref is not None else p
                if decl is not None:
                    self._validate_element(
                        child, decl, errors, f"{path}/{_local(qname)}"
                    )
                return i + 1
            if p.ref is not None:
                # substitution group: a member element may stand in for
                # the referenced head (validated against its OWN decl)
                key = (_ns_of(child.tag), _local(child.tag))
                head, seen = self.subst_head.get(key), {key}
                while head is not None and head not in seen:
                    if head == p.ref:
                        decl = self.elements.get(key)
                        if decl is not None:
                            self._validate_element(
                                child, decl, errors, f"{path}/{_local(child.tag)}"
                            )
                        return i + 1
                    seen.add(head)
                    head = self.subst_head.get(head)
            return None
        if p.kind == "sequence":
            j = i
            for sub in p.items:
                j2 = self._match(sub, children, j, errors, path)
                if j2 is None:
                    return None
                j = j2
            return j
        if p.kind == "choice":
            # Each branch is attempted against a private error buffer so an
            # abandoned attempt (branch rejected, another chosen) cannot
            # leak its child-validation errors into the shared list; only
            # the committed branch's errors are merged.
            zero_width = False
            for sub in p.items:
                branch_errors: list[str] = []
                j = self._match(sub, children, i, branch_errors, path)
                if j is not None and j > i:
                    errors.extend(branch_errors)
                    return j
                if j == i:
                    zero_width = True
            # all branches empty-matched: a zero-width success
            return i if zero_width else None
        if p.kind == "all":
            by_name = {}
            for sub in p.items:
                q = sub.qname
                if q is None and sub.ref is not None:
                    q = f"{{{sub.ref[0]}}}{sub.ref[1]}"
                by_name[q] = sub
            seen: dict[str, int] = {}
            j = i
            while j < len(children) and children[j].tag in by_name:
                sub = by_name[children[j].tag]
                seen[children[j].tag] = seen.get(children[j].tag, 0) + 1
                if seen[children[j].tag] > sub.max:
                    errors.append(
                        f"{path}: <{_local(children[j].tag)}> repeats beyond maxOccurs"
                    )
                self._validate_element(
                    children[j], sub, errors, f"{path}/{_local(children[j].tag)}"
                )
                j += 1
            for q, sub in by_name.items():
                if sub.min > 0 and seen.get(q, 0) < sub.min:
                    errors.append(f"{path}: missing required <{_local(q)}> (xs:all)")
            return j
        raise ValueError(p.kind)

    def _check_simple(self, value: str, st: SimpleType, errors, path) -> None:
        seen: set[tuple[str, str]] = set()
        while True:
            if st.enumeration is not None and value not in st.enumeration:
                errors.append(f"{path}: '{value}' not in enumeration {st.enumeration}")
            if st.max_length is not None and len(value) > st.max_length:
                errors.append(f"{path}: length {len(value)} > maxLength {st.max_length}")
            if st.patterns is not None:
                ok = False
                for pat in st.patterns:
                    if r"\p" in pat:
                        # Python re lacks \p{..}; the only such pattern here
                        # is classification's [^\p{C}\p{Z}]+ (no separators
                        # or control chars).
                        ok = ok or bool(value) and re.search(r"\s", value) is None
                    else:
                        ok = ok or re.fullmatch(pat, value) is not None
                if not ok:
                    errors.append(f"{path}: '{value}' fails patterns {st.patterns}")
            if st.min_inclusive is not None or st.max_inclusive is not None:
                try:
                    x = float(value)
                    if st.min_inclusive is not None and x < st.min_inclusive:
                        errors.append(f"{path}: {x} < minInclusive")
                    if st.max_inclusive is not None and x > st.max_inclusive:
                        errors.append(f"{path}: {x} > maxInclusive")
                except ValueError:
                    errors.append(f"{path}: '{value}' is not numeric")
            base = st.base
            if base is None or base in seen:
                return
            seen.add(base)
            if base[0] == XS:
                b = base[1]
                if b == "boolean" and value not in ("true", "false", "0", "1"):
                    errors.append(f"{path}: '{value}' is not xs:boolean")
                elif b == "date" and re.fullmatch(r"\d{2}-\d{2}-\d{4}|\d{4}-\d{2}-\d{2}", value) is None:
                    errors.append(f"{path}: '{value}' is not a date")
                elif b in ("decimal", "float", "double"):
                    try:
                        float(value)
                    except ValueError:
                        errors.append(f"{path}: '{value}' is not {b}")
                return
            nxt = self.types.get(base)
            if not isinstance(nxt, SimpleType):
                return
            st = nxt
