"""Generate Jupyter notebooks from the tutorial scripts.

The reference ships its tutorials as notebooks (examples/tutorials/*.ipynb,
run in CI via papermill); ours are plain scripts smoke-tested in CI
(tests/test_tutorials.py). This converter emits a runnable .ipynb for each
script so notebook users get the same workflow:

    python examples/make_notebooks.py
"""

import ast
import os

import nbformat as nbf

EXAMPLES = os.path.dirname(os.path.abspath(__file__))
TUTORIALS = [
    "brca_subtype_tutorial",
    "survival_subtypes_tutorial",
    "gnn_custom_networks_tutorial",
    "crossmodal_translation_tutorial",
    "cbioportal_tutorial",
]


def convert(name: str) -> str:
    src = open(os.path.join(EXAMPLES, f"{name}.py")).read()
    tree = ast.parse(src)
    docstring = ast.get_docstring(tree) or name
    body = src.split('"""', 2)[2].lstrip("\n")
    body = body.replace('if __name__ == "__main__":\n    main()', "main()")
    nb = nbf.v4.new_notebook()
    nb.cells = [
        nbf.v4.new_markdown_cell(f"# {name.replace('_', ' ')}\n\n{docstring}"),
        nbf.v4.new_code_cell(body.rstrip() + "\n"),
    ]
    out = os.path.join(EXAMPLES, "notebooks", f"{name}.ipynb")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        nbf.write(nb, fh)
    return out


if __name__ == "__main__":
    for name in TUTORIALS:
        print("wrote", convert(name))
