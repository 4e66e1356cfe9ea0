package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Reconcile
import graft.model.Span
import graft.tokenize.{DocGen, SpanTokenizer}

/** Span-attached provenance boxes (x27) + the IoU margins the x24 oracle's
  * id-schedule reduction relies on: same-span boxes have IoU exactly 1,
  * neighboring-span boxes stay far below the 0.4 threshold (~0.043 or 0 on
  * modular wrap), so no outcome is boundary-sensitive to floating point.
  */
class ReconcileSpanBoxSpec extends AnyFunSuite {

  test("same-span IoU is 1; neighboring-span IoU is far below threshold") {
    (0L until 5000L).foreach { id =>
      val a = DocGen.spanBbox(id, 0)
      assert(Reconcile.bboxIou(a, a) == 1.0)
      val iou = Reconcile.bboxIou(a, DocGen.spanBbox(id, 1))
      assert(iou < 0.05, s"id=$id iou=$iou")
      assert(iou < Reconcile.iouThreshold - 0.35) // explicit margin
    }
  }

  test("provenance leaf carries the page rule, block id form and unit-square bbox") {
    val p = SpanTokenizer.provenanceOf("doc_000000042",
      Span("text", "t", "", 31), "tokenize:v1")
    assert(p.page == 3)
    assert(p.source_block_id == "blk_p3_31")
    assert(p.extraction_path == Seq("tokenize:v1"))
    (0L until 2000L).foreach { id =>
      (0 until 40).foreach { off =>
        val b = DocGen.spanBbox(id, off)
        assert(b.x1 >= 0 && b.y1 >= 0 && b.x2 <= 1.0 && b.y2 <= 1.0)
        assert(b.x2 > b.x1 && b.y2 > b.y1)
      }
    }
  }
}
