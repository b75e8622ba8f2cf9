"""Interactive wizard: config-building flow round-trips through the real
loaders (ref Interactive.py new_training, which the reference README marks
broken — here it must actually work)."""

import io

from nuzero_tpu.interactive import Wizard


def _scripted(answers):
    it = iter(answers)

    def input_fn(prompt):
        return next(it)

    return input_fn


def test_new_training_writes_loadable_configs(tmp_path, monkeypatch):
    import nuzero_tpu.interactive as interactive

    monkeypatch.setattr(interactive, "REPO", str(tmp_path))
    out = io.StringIO()
    # game=ttt, arch=mlp, name, then all-default hyperparameters
    # (empty string = accept default), optimizer=SGD, mode=sequential.
    answers = ["0", "0", "wiz_test"] + [""] * 7 + ["0", ""] + [""] * 4 + ["0"]
    w = Wizard(_scripted(answers), out.write)
    game, arch, name, train_path, search_path = w.new_training(launch=False)
    assert (game, arch, name) == ("ttt", "mlp", "wiz_test")

    from nuzero_tpu.config import load_search_config, load_training_config

    cfg = load_training_config(train_path)
    assert cfg.network_name == "wiz_test"
    assert cfg.running.training_steps == 300
    assert cfg.optimizer.optimizer_choice == "SGD"
    assert cfg.optimizer.starting_lr == 0.1
    assert cfg.learning.normalize_cel is True
    search = load_search_config(search_path)
    assert search.num_simulations == 100
    assert search.keep_subtree is True


def test_printbar_output():
    from nuzero_tpu.utils.printbar import PrintBar

    out = io.StringIO()
    bar = PrintBar("fill", total=4, width=4, stream=out)
    for _ in range(4):
        bar.next()
    lines = [l for l in out.getvalue().splitlines() if l]
    assert lines[0].startswith("fill |····|")
    assert lines[-1].endswith("100%")
    assert "████" in lines[-1]
