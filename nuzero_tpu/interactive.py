"""Interactive terminal wizard (ref ``Interactive.py``).

The reference ships a Q&A wizard that edits base YAML configs and launches
training/testing; its README marks it "currently not working"
(ref ``README.md:96``).  This is a minimal working equivalent: pick a
preset, optionally rename the run, launch.
"""

from __future__ import annotations


def _ask(prompt: str, options):
    while True:
        print(prompt)
        for i, (label, _) in enumerate(options):
            print(f"  {i}) {label}")
        choice = input("> ").strip()
        if choice.isdigit() and 0 <= int(choice) < len(options):
            return options[int(choice)][1]
        print("invalid choice")


def start():
    import run as runner

    mode = _ask(
        "What would you like to do?",
        [("Train a network", "train"), ("Test agents", "test"), ("Quit", "quit")],
    )
    if mode == "quit":
        return
    if mode == "train":
        preset = _ask(
            "Pick a training preset:",
            [
                ("Tic-Tac-Toe + MLP", 0),
                ("Tic-Tac-Toe + RecurrentNet", 1),
                ("SCS 5x5 + hex RecurrentNet", 2),
                ("SCS solo-scout + hex RecurrentNet", 3),
            ],
        )
        name = input("Run name (empty = default): ").strip() or None
        runner.training_preset(preset, name)
    else:
        preset = _ask(
            "Pick a testing preset:",
            [
                ("TTT trained agents vs random", 0),
                ("SCS goal-rush baseline", 1),
                ("SCS iteration-extrapolation sweep", 2),
            ],
        )
        name = input("Run name to load (empty = default): ").strip() or None
        runner.testing_preset(preset, name)
