"""Build-artifact oracle: compile and run the (patched) reference C
binary on a deterministically serialized corpus (SURVEY §5.2/5.4.2).

The reference sources are COPIED to a temp dir before the one-line D1
patch (double fclose of the input file, main.c:289 + b()'s second
fclose) is applied — /root/reference itself is never touched.  The
patched binary is a BUILD oracle only; its query path has defect D3
(phantom postings / hang, SURVEY §5.3) so query goldens come from the
spec-level scorer instead (tests/oracle_util.CorpusOracle).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pandas as pd


def serialize_trec(pdf: pd.DataFrame, path: str) -> None:
    """Rows (repo, path, commit, content) -> TREC file in canonical
    (repo, path, commit) order so reference doc_ids coincide with ours
    (FIXTURES.md §4).  Body = url + '\\n' + content + '\\n'; the
    reference's len = e-s-1 strips exactly the final newline, so the
    trailing-token rule applies to content's own last char."""
    pdf = pdf.sort_values(["repo", "path", "commit"])
    with open(path, "w", encoding="utf-8") as f:
        for r in pdf.itertuples():
            url = f"http://{r.repo}/{r.path}#{r.commit}"
            content = r.content or ""
            assert "<TEXT>" not in content and "</TEXT>" not in content
            f.write(f"<DOC>\n<TEXT>\n{url}\n{content}\n</TEXT>\n</DOC>\n")


def compile_patched_reference(
    workdir: str, reference: str = "/root/reference", patch_d4: bool = True
) -> str:
    """Copy sources, apply the D1 (and optionally D4) patch, compile.

    D1 (always): b() re-closes f_in after parse() already fclosed it
    (main.c:289 + the fclose after the parse call) -> glibc abort.

    D4 (default on): new-term map entries memcpy the term into
    ``key_string`` WITHOUT zeroing the malloc'd struct (main.c:153),
    while the map hashes/compares with strlen/strcmp — heap garbage
    after the term splits one term into several term_ids, and when two
    fragments' garbage happens to collide byte-wise, hashmap_set
    REPLACES the earlier fragment and its postings are lost outright.
    Discovered empirically in this sandbox (12/122 terms split on a
    500-doc corpus, 5 postings lost).  One-line memset fix makes the
    binary a deterministic build oracle; the unpatched behavior is
    pinned by tests/test_build_vs_oracle.py::test_d4_unpatched_splits.
    """
    src_dst = os.path.join(workdir, "ref")
    shutil.copytree(
        reference, src_dst, ignore=shutil.ignore_patterns("bin", "main", "*.pdf")
    )
    main_c = os.path.join(src_dst, "src", "main.c")
    with open(main_c) as f:
        text = f.read()
    needle = "parse(f_in, percentage);\n   fclose(f_in);"
    assert needle in text, "reference main.c layout changed; patch needs review"
    text = text.replace(needle, "parse(f_in, percentage);")
    if patch_d4:
        needle4 = (
            "value = (map_entry*)malloc(sizeof(map_entry));\n"
            "         int term_id = term_id_counter;\n"
            "         memcpy(value->key_string ,term, len);"
        )
        assert needle4 in text, "reference main.c layout changed; D4 patch needs review"
        text = text.replace(
            needle4,
            "value = (map_entry*)malloc(sizeof(map_entry));\n"
            "         memset(value->key_string, 0, sizeof(value->key_string));\n"
            "         int term_id = term_id_counter;\n"
            "         memcpy(value->key_string ,term, len);",
        )
    with open(main_c, "w") as f:
        f.write(text)
    binary = os.path.join(src_dst, "refmain")
    subprocess.run(
        ["gcc", "-w", "-O2", "-I", "include"]
        + sorted(
            os.path.join("src", p)
            for p in os.listdir(os.path.join(src_dst, "src"))
            if p.endswith(".c")
        )
        + ["-o", binary, "-lm"],
        cwd=src_dst,
        check=True,
        capture_output=True,
    )
    return binary


def run_reference_build(
    binary: str, trec_path: str, workdir: str, mem_mb: int = 400
) -> str:
    """Run ``refmain -b corpus.trec`` in an isolated cwd; returns the
    output/ dir containing lexicon, inverted_list, doc_table."""
    run_dir = os.path.join(workdir, "run")
    os.makedirs(run_dir, exist_ok=True)
    subprocess.run(
        [binary, "-m", str(mem_mb), "-b", trec_path],
        cwd=run_dir,
        check=True,
        capture_output=True,
        timeout=600,
    )
    return os.path.join(run_dir, "output")


def build_reference_index(
    pdf: pd.DataFrame, workdir: str | None = None, patch_d4: bool = True
) -> str:
    """Convenience: corpus frame -> reference output/ dir."""
    if workdir is None:
        workdir = tempfile.mkdtemp(prefix="c_oracle_")
    trec = os.path.join(workdir, "corpus.trec")
    serialize_trec(pdf, trec)
    binary = compile_patched_reference(workdir, patch_d4=patch_d4)
    return run_reference_build(binary, trec, workdir)
