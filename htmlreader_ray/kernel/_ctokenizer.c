/* C accelerator for the HTML tokenizer's DATA state.
 *
 * Scans text runs and "simple" tags (the conservative grammar of the
 * Python fast path in tokenizer.py: ASCII names, plain attributes, no
 * entities/NULs in values) and returns a batch of ready token tuples.
 * Anything outside the subset returns control to the pure-Python state
 * machine at the exact position, so semantics are identical by
 * construction; character references are decoded through a Python
 * callback so the single WHATWG table stays authoritative.
 *
 * Only 1-byte (Latin-1 kind) unicode is handled here; other kinds bail
 * to Python immediately. Parity is enforced by differential fuzzing in
 * tests/test_ctokenizer.py.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define REASON_EOF 0
#define REASON_COMPLEX 1
#define REASON_PAUSE 2

/* character class tables for UCS1 */
static unsigned char is_ws[256];
static unsigned char is_name_start[256];   /* tag name start: a-zA-Z */
static unsigned char is_name_char[256];    /* tag name cont: a-zA-Z0-9- */
static unsigned char is_attr_first[256];   /* not ws / > < = " ' \0 */
static unsigned char is_attr_cont[256];    /* not ws / > < = " ' \0 */
static unsigned char is_unquoted[256];     /* not ws > " ' < = ` & \0 */

static void init_tables(void) {
    int i;
    for (i = 0; i < 256; i++) {
        is_ws[i] = (i == '\t' || i == '\n' || i == 0x0c || i == ' ');
        is_name_start[i] = ((i >= 'a' && i <= 'z') || (i >= 'A' && i <= 'Z'));
        is_name_char[i] = (is_name_start[i] || (i >= '0' && i <= '9')
                           || i == '-');
        is_attr_first[i] = !(is_ws[i] || i == '/' || i == '>' || i == '<'
                             || i == '=' || i == '"' || i == '\'' || i == 0);
        is_attr_cont[i] = !(is_ws[i] || i == '/' || i == '>' || i == '<'
                            || i == '=' || i == '"' || i == '\'' || i == 0);
        is_unquoted[i] = !(is_ws[i] || i == '>' || i == '"' || i == '\''
                           || i == '<' || i == '=' || i == '`' || i == '&'
                           || i == 0);
    }
}

/* ASCII-fold a latin-1 name (only A-Z fold; other bytes pass through) */
static PyObject *lower_name(const Py_UCS1 *p, Py_ssize_t len) {
    Py_UCS1 buf[256];
    Py_ssize_t i;
    if (len >= 256) return NULL;
    for (i = 0; i < len; i++) {
        Py_UCS1 c = p[i];
        buf[i] = (c >= 'A' && c <= 'Z') ? (Py_UCS1)(c + 32) : c;
    }
    return PyUnicode_FromKindAndData(PyUnicode_1BYTE_KIND, buf, len);
}

/* Parse a simple tag starting at s[lt] == '<'. On success append the token
 * to toks and set *out_end to the position after '>'; returns 1. Returns 0
 * when the tag is not simple (caller bails to Python), -1 on error.
 * Sets *out_is_start/*out_name_obj (borrowed? no: new ref via toks). */
static int parse_simple_tag(const Py_UCS1 *d, Py_ssize_t n, Py_ssize_t lt,
                            PyObject *toks, Py_ssize_t *out_end,
                            PyObject **out_start_name) {
    Py_ssize_t i = lt + 1;
    int is_end = 0;
    *out_start_name = NULL;
    if (i >= n) return 0;
    if (d[i] == '/') { is_end = 1; i++; }
    if (i >= n || !is_name_start[d[i]]) return 0;
    Py_ssize_t name_start = i;
    while (i < n && is_name_char[d[i]]) i++;
    Py_ssize_t name_len = i - name_start;
    if (i >= n) return 0;

    if (is_end) {
        while (i < n && is_ws[d[i]]) i++;
        if (i >= n || d[i] != '>') return 0;
        PyObject *name = lower_name(d + name_start, name_len);
        if (!name) return 0;
        PyObject *tok = Py_BuildValue("(sN)", "end", name);
        if (!tok) return -1;
        if (PyList_Append(toks, tok) < 0) { Py_DECREF(tok); return -1; }
        Py_DECREF(tok);
        *out_end = i + 1;
        return 1;
    }

    /* start tag: attributes */
    PyObject *attrs = PyDict_New();
    if (!attrs) return -1;
    int self_closing = 0;
    for (;;) {
        if (i >= n) goto bail;
        Py_UCS1 c = d[i];
        if (c == '>') { i++; break; }
        if (c == '/') {
            if (i + 1 < n && d[i + 1] == '>') { self_closing = 1; i += 2; break; }
            goto bail;
        }
        if (!is_ws[c]) goto bail;  /* attrs must be ws-separated */
        while (i < n && is_ws[d[i]]) i++;
        if (i >= n) goto bail;
        c = d[i];
        if (c == '>') { i++; break; }
        if (c == '/') {
            if (i + 1 < n && d[i + 1] == '>') { self_closing = 1; i += 2; break; }
            goto bail;
        }
        /* attribute name */
        if (!is_attr_first[c]) goto bail;
        Py_ssize_t an_start = i;
        i++;
        while (i < n && is_attr_cont[d[i]]) i++;
        Py_ssize_t an_len = i - an_start;
        if (i >= n) goto bail;
        PyObject *val = NULL;
        if (d[i] == '=') {
            i++;
            if (i >= n) goto bail;
            Py_UCS1 q = d[i];
            if (q == '"' || q == '\'') {
                i++;
                Py_ssize_t v_start = i;
                while (i < n) {
                    Py_UCS1 vc = d[i];
                    if (vc == q) break;
                    if (vc == '&' || vc == '<' || vc == 0) goto bail;
                    i++;
                }
                if (i >= n) goto bail;
                val = PyUnicode_FromKindAndData(PyUnicode_1BYTE_KIND,
                                                d + v_start, i - v_start);
                i++;  /* past closing quote */
            } else {
                Py_ssize_t v_start = i;
                while (i < n && is_unquoted[d[i]]) i++;
                if (i == v_start) goto bail;  /* empty unquoted (e.g. a=>) */
                if (i >= n) goto bail;
                val = PyUnicode_FromKindAndData(PyUnicode_1BYTE_KIND,
                                                d + v_start, i - v_start);
            }
        } else {
            val = PyUnicode_FromStringAndSize("", 0);
        }
        if (!val) { Py_DECREF(attrs); return -1; }
        PyObject *aname = lower_name(d + an_start, an_len);
        if (!aname) { Py_DECREF(val); goto bail_noname; }
        if (PyDict_Contains(attrs, aname)) {
            /* duplicate attribute: bail to the Python state machine so the
             * duplicate-attribute parse error is reported (rare in real
             * HTML, so the fast path gives nothing up) */
            Py_DECREF(aname); Py_DECREF(val); goto bail;
        }
        if (PyDict_SetItem(attrs, aname, val) < 0) {
            Py_DECREF(aname); Py_DECREF(val); Py_DECREF(attrs);
            return -1;
        }
        Py_DECREF(aname);
        Py_DECREF(val);
    }
    {
        PyObject *name = lower_name(d + name_start, name_len);
        if (!name) goto bail_noname;
        PyObject *tok = Py_BuildValue("(sOOO)", "start", name, attrs,
                                      self_closing ? Py_True : Py_False);
        Py_DECREF(attrs);
        if (!tok) { Py_DECREF(name); return -1; }
        if (PyList_Append(toks, tok) < 0) {
            Py_DECREF(tok); Py_DECREF(name); return -1;
        }
        Py_DECREF(tok);
        *out_start_name = name;  /* new reference, caller owns */
        *out_end = i;
        return 1;
    }
bail:
    Py_DECREF(attrs);
    if (PyErr_Occurred()) PyErr_Clear();
    return 0;
bail_noname:
    Py_DECREF(attrs);
    if (PyErr_Occurred()) PyErr_Clear();
    return 0;
}

/* Try a simple comment <!--data--> at s[lt]=='<': no NULs, no interior
 * "--", no abrupt closings. Returns 1 and appends the token on success,
 * 0 to bail to Python, -1 on error. */
static int try_simple_comment(const Py_UCS1 *d, Py_ssize_t n, Py_ssize_t lt,
                              PyObject *toks, Py_ssize_t *out_end) {
    if (!(lt + 3 < n && d[lt + 1] == '!' && d[lt + 2] == '-'
          && d[lt + 3] == '-'))
        return 0;
    Py_ssize_t p = lt + 4;
    if (p < n && d[p] == '>') return 0;                    /* <!--> */
    if (p + 1 < n && d[p] == '-' && d[p + 1] == '>') return 0;  /* <!---> */
    Py_ssize_t q = p;
    Py_ssize_t close = -1;
    for (; q + 1 < n; q++) {
        Py_UCS1 c = d[q];
        if (c == 0) return 0;
        if (c == '-' && d[q + 1] == '-') { close = q; break; }
    }
    if (close < 0 || close + 2 >= n || d[close + 2] != '>') return 0;
    PyObject *data = PyUnicode_FromKindAndData(PyUnicode_1BYTE_KIND,
                                               d + p, close - p);
    if (!data) return -1;
    PyObject *tok = Py_BuildValue("(sN)", "comment", data);
    if (!tok) return -1;
    if (PyList_Append(toks, tok) < 0) { Py_DECREF(tok); return -1; }
    Py_DECREF(tok);
    *out_end = close + 3;
    return 1;
}

/* flush accumulated chars fragments (list) as one ("chars", s) token */
static int flush_chars(PyObject *frags, PyObject *toks) {
    Py_ssize_t nf = PyList_GET_SIZE(frags);
    if (nf == 0) return 0;
    PyObject *sep = PyUnicode_FromStringAndSize("", 0);
    if (!sep) return -1;
    PyObject *joined = PyUnicode_Join(sep, frags);
    Py_DECREF(sep);
    if (!joined) return -1;
    if (PyUnicode_GET_LENGTH(joined) == 0) {
        Py_DECREF(joined);
        if (PyList_SetSlice(frags, 0, nf, NULL) < 0) return -1;
        return 0;
    }
    PyObject *tok = Py_BuildValue("(sN)", "chars", joined);
    if (!tok) return -1;
    if (PyList_Append(toks, tok) < 0) { Py_DECREF(tok); return -1; }
    Py_DECREF(tok);
    if (PyList_SetSlice(frags, 0, nf, NULL) < 0) return -1;
    return 0;
}

/* scan(s, pos, pause_set, entity_cb) -> (tokens, new_pos, reason) */
static PyObject *scan(PyObject *self, PyObject *args) {
    PyObject *s, *pause_set, *entity_cb;
    Py_ssize_t pos;
    if (!PyArg_ParseTuple(args, "UnOO", &s, &pos, &pause_set, &entity_cb))
        return NULL;
    if (PyUnicode_READY(s) < 0) return NULL;
    Py_ssize_t n = PyUnicode_GET_LENGTH(s);
    if (PyUnicode_KIND(s) != PyUnicode_1BYTE_KIND) {
        /* non-latin1 text: let Python handle the whole stream */
        return Py_BuildValue("([]ni)", pos, REASON_COMPLEX);
    }
    const Py_UCS1 *d = PyUnicode_1BYTE_DATA(s);

    PyObject *toks = PyList_New(0);
    PyObject *frags = PyList_New(0);
    if (!toks || !frags) { Py_XDECREF(toks); Py_XDECREF(frags); return NULL; }

    Py_ssize_t i = pos;
    int reason = REASON_EOF;

    while (i < n) {
        /* bulk text run up to '<', '&' or NUL (NUL bails to Python so the
         * unexpected-null-character parse error is reported) */
        Py_ssize_t run_start = i;
        while (i < n && d[i] != '<' && d[i] != '&' && d[i] != 0) i++;
        if (i > run_start) {
            PyObject *frag = PyUnicode_FromKindAndData(
                PyUnicode_1BYTE_KIND, d + run_start, i - run_start);
            if (!frag) goto error;
            int rc = PyList_Append(frags, frag);
            Py_DECREF(frag);
            if (rc < 0) goto error;
        }
        if (i >= n) break;
        if (d[i] == 0) {
            if (flush_chars(frags, toks) < 0) goto error;
            Py_DECREF(frags);
            return Py_BuildValue("(Nni)", toks, i, REASON_COMPLEX);
        }
        if (d[i] == '&') {
            /* decode via Python callback: returns (text, new_pos) */
            PyObject *res = PyObject_CallFunction(entity_cb, "On", s, i);
            if (!res) goto error;
            PyObject *txt = PyTuple_GetItem(res, 0);   /* borrowed */
            PyObject *npos = PyTuple_GetItem(res, 1);  /* borrowed */
            if (!txt || !npos) { Py_DECREF(res); goto error; }
            int rc = PyList_Append(frags, txt);
            Py_ssize_t np = PyLong_AsSsize_t(npos);
            Py_DECREF(res);
            if (rc < 0 || (np == -1 && PyErr_Occurred())) goto error;
            if (np <= i) goto error_state;  /* defensive: must advance */
            i = np;
            continue;
        }
        /* '<': flush text (matches Python coalescing), then try simple tag */
        if (flush_chars(frags, toks) < 0) goto error;
        {
            Py_ssize_t tag_end = 0;
            PyObject *start_name = NULL;
            int rc = try_simple_comment(d, n, i, toks, &tag_end);
            if (rc < 0) goto error;
            if (rc == 1) { i = tag_end; continue; }
            rc = parse_simple_tag(d, n, i, toks, &tag_end, &start_name);
            if (rc < 0) goto error;
            if (rc == 0) {
                /* not a simple tag: Python takes over at '<' */
                Py_DECREF(frags);
                return Py_BuildValue("(Nni)", toks, i, REASON_COMPLEX);
            }
            i = tag_end;
            if (start_name != NULL) {
                int paused = PySequence_Contains(pause_set, start_name);
                Py_DECREF(start_name);
                if (paused < 0) goto error;
                if (paused) {
                    Py_DECREF(frags);
                    return Py_BuildValue("(Nni)", toks, i, REASON_PAUSE);
                }
            }
        }
    }
    if (flush_chars(frags, toks) < 0) goto error;
    Py_DECREF(frags);
    return Py_BuildValue("(Nni)", toks, n, reason);

error_state:
    PyErr_SetString(PyExc_RuntimeError, "entity callback did not advance");
error:
    Py_XDECREF(toks);
    Py_XDECREF(frags);
    return NULL;
}

static PyMethodDef methods[] = {
    {"scan", scan, METH_VARARGS, "scan data state"},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_ctokenizer", NULL, -1, methods
};

PyMODINIT_FUNC PyInit__ctokenizer(void) {
    init_tables();
    return PyModule_Create(&module);
}
