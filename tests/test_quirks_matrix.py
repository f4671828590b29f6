"""Quirks-mode classification matrix (spec §13.2.6.4.1; reference
/root/reference/Sources/HTMLParser.m:172-305): every public-ID prefix class
plus the exact/system/limited rules."""

import pytest

from htmlreader_ray.kernel import parse
from htmlreader_ray.kernel.constants import (LIMITED_QUIRKS_PREFIXES,
                                             QUIRKY_IF_NO_SYSTEM_PREFIXES,
                                             QUIRKY_PUBLIC_PREFIXES)


def mode_for(doctype):
    return parse(doctype + "<p>x").quirks_mode


@pytest.mark.parametrize("prefix", QUIRKY_PUBLIC_PREFIXES)
def test_quirky_public_prefixes(prefix):
    assert mode_for(f'<!DOCTYPE html PUBLIC "{prefix}whatever">') == "quirks"


@pytest.mark.parametrize("prefix", QUIRKY_PUBLIC_PREFIXES[:5])
def test_quirky_prefixes_case_insensitive(prefix):
    assert mode_for(
        f'<!DOCTYPE html PUBLIC "{prefix.upper()}x">') == "quirks"


@pytest.mark.parametrize("prefix", QUIRKY_IF_NO_SYSTEM_PREFIXES)
def test_html401_prefixes_depend_on_system(prefix):
    assert mode_for(f'<!DOCTYPE html PUBLIC "{prefix}EN">') == "quirks"
    assert mode_for(
        f'<!DOCTYPE html PUBLIC "{prefix}EN" "http://sys">') == \
        "limited-quirks"


@pytest.mark.parametrize("prefix", LIMITED_QUIRKS_PREFIXES)
def test_limited_quirks_prefixes(prefix):
    assert mode_for(f'<!DOCTYPE html PUBLIC "{prefix}EN">') == \
        "limited-quirks"


def test_exact_rules():
    assert mode_for("<!DOCTYPE html>") == "no-quirks"
    assert mode_for("") == "quirks"                       # missing doctype
    assert mode_for("<!DOCTYPE foo>") == "quirks"         # wrong name
    assert mode_for('<!DOCTYPE html PUBLIC "HTML">') == "quirks"
    assert mode_for('<!DOCTYPE html PUBLIC '
                    '"-//W3O//DTD W3 HTML Strict 3.0//EN//">') == "quirks"
    assert mode_for('<!DOCTYPE html PUBLIC '
                    '"-/W3C/DTD HTML 4.0 Transitional/EN">') == "quirks"
    assert mode_for(
        '<!DOCTYPE html SYSTEM '
        '"http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd">') \
        == "quirks"
    # force-quirks from a bogus doctype
    assert mode_for("<!DOCTYPE html BOGUS nonsense>") == "quirks"
    # unknown public id: fine
    assert mode_for('<!DOCTYPE html PUBLIC "-//Unknown//EN">') == "no-quirks"
