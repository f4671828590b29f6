"""Single-document HTML5 kernel: tokenizer, tree construction, selectors,
extraction. Runs entirely inside one map_batches UDF call (SURVEY.md §1.4)."""

from .dom import (Comment, Doctype, Document, Element, Node, Text,
                  HTML_NS, MATHML_NS, SVG_NS)
from .parser import parse, parse_bytes, parse_fragment
from .serialize import serialize, serialize_fragment
from .entities import html_escape, html_unescape
