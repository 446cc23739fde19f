"""Chessboard tests (reference: examples/wchess/libwchess/test-chessboard.cpp)."""

import pytest

from whisper_tpu.decoding.grammar_parser import parse
from whisper_tpu.utils.chess import Chessboard, parse_sq, sq_name


def test_squares():
    assert sq_name(0) == "a1" and sq_name(63) == "h8"
    assert parse_sq("e2") == 12 and parse_sq("E4") == 28
    assert parse_sq("j9") is None


def test_opening_moves():
    b = Chessboard()
    assert b.process("e2 e4") == "e2-e4"
    assert b.turn == "b"
    assert b.process("e7 to e5") == "e7-e5"
    assert b.process("knight to f3") == "g1-f3"
    # illegal: pawn sideways
    assert b.process("a2 b3") == ""
    # piece-name with ambiguous destination fails (both knights to c3/c6?)
    b2 = Chessboard()
    assert b2.process("knight to f3") == "g1-f3"


def test_blocking_and_capture():
    b = Chessboard()
    b.process("e2 e4")
    b.process("d7 d5")
    res = b.process("e4 d5")  # pawn capture
    assert res == "e4-d5"
    # black queen can recapture
    assert b.process("queen to d5") == "d8-d5"


def test_check_legality():
    """After a discovered-check setup, only check-resolving moves allowed."""
    b = Chessboard()
    b.process("e2 e4")
    b.process("e7 e5")
    b.process("d1 h5")   # queen out
    b.process("b8 c6")
    b.process("h5 f7")   # Qxf7+ check (guarded by nothing here: king must act)
    assert b.in_check("b")
    legal = b.all_legal()
    # every legal reply must resolve the check
    for src, dsts in legal.items():
        for dst in dsts:
            saved = b.board.get(dst)
            b.board[dst] = b.board.pop(src)
            assert not b.in_check("b")
            b.board[src] = b.board.pop(dst)
            if saved is not None:
                b.board[dst] = saved
    # king takes the queen is among them
    assert b.process("king to f7") == "e8-f7"


def test_grammar_generation_parses():
    b = Chessboard()
    g = b.grammar()
    st = parse(g)
    assert {"root", "piece", "frompos", "topos"} <= set(st.symbol_ids)
    # only reachable first-move squares appear
    assert '"e4"' in g and '"e5"' not in g
    assert '"knight"' in g and '"queen"' not in g


def test_castling_kingside():
    b = Chessboard()
    b.process("e2 e4"); b.process("e7 e5")
    b.process("g1 f3"); b.process("b8 c6")
    b.process("f1 c4"); b.process("g8 f6")
    assert 6 in b.legal_moves(4)           # e1 -> g1 available
    assert b.process("king to g1") == "e1-g1"
    assert b.board[6] == ("w", "K") and b.board[5] == ("w", "R")
    assert 4 not in b.board and 7 not in b.board
    assert not b.castle_rights["wK"] and not b.castle_rights["wQ"]


def test_castling_blocked_by_attack():
    b = Chessboard()
    # clear white's kingside, then park a black rook on g3 covering g1
    for sq in (5, 6):
        b.board.pop(sq, None)
    b.board.pop(14, None)                  # remove g2 pawn so g1 is covered
    b.board[22] = ("b", "R")               # g3
    assert 6 not in b.legal_moves(4)
    # moving the king forfeits the rights even after it returns
    b.board[22] = ("b", "R")
    b.process("e1 f1"); b.process("a7 a6")
    b.process("f1 e1"); b.process("a6 a5")
    assert not b.castle_rights["wK"]
    assert 6 not in b.legal_moves(4)


def test_en_passant():
    b = Chessboard()
    b.process("e2 e4"); b.process("a7 a6")
    b.process("e4 e5"); assert b.process("d7 d5") == "d7-d5"
    assert b.ep_square == 43               # d6
    assert 43 in b.legal_moves(36)         # e5 pawn may capture d6
    assert b.process("e5 d6") == "e5-d6"
    assert 35 not in b.board               # the d5 pawn is gone
    # the right expires after one ply
    b2 = Chessboard()
    b2.process("e2 e4"); b2.process("a7 a6")
    b2.process("e4 e5"); b2.process("d7 d5")
    b2.process("b1 c3"); b2.process("a6 a5")
    assert 43 not in b2.legal_moves(36)


def test_promotion():
    b = Chessboard()
    # clear a path artificially: put a white pawn on a7
    b.board.pop(48, None)  # remove black a7 pawn
    b.board.pop(56, None)  # remove black a8 rook
    b.board[48] = ("w", "P")
    b.move_count = 0  # white to move
    assert b.process("a7 a8") == "a7-a8"
    assert b.board[56] == ("w", "Q")
