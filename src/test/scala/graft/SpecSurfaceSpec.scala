package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{SpecSurface, TransformOp}

/** Drift enforcement between the config surface, its user-facing reference
  * doc, and the spec fuzzer (round-13 directive #8): `SpecSurface` is the
  * single source of truth; this suite fails when
  *   - an op is listed but not dispatched by the validator (or vice versa),
  *   - `docs/SPEC_REFERENCE.md` documents a different op set than the code,
  *   - any config field (reflectively enumerated per case class) is absent
  *     from the doc,
  *   - SpecFuzzProperties carries no valid-spec generator for a listed op.
  */
class SpecSurfaceSpec extends AnyFunSuite {

  private lazy val doc: String =
    Files.readString(Paths.get("docs/SPEC_REFERENCE.md"))

  test("every listed op is dispatched by the validator; unknown ops name the full list") {
    SpecSurface.transformOps.foreach { op =>
      // an empty TransformOp of a KNOWN op fails on its own required-field
      // message (never the unknown-op fallthrough); a validator that no
      // longer dispatches the op would hit the fallthrough and fail here
      val msg =
        try { TransformOp(op = op).validate("spec"); "" }
        catch { case e: IllegalArgumentException => e.getMessage }
      assert(!msg.contains("unknown transform op"),
        s"op '$op' is listed in SpecSurface but not dispatched: $msg")
    }
    val unknown = intercept[IllegalArgumentException] {
      TransformOp(op = "no_such_op").validate("spec")
    }.getMessage
    assert(unknown.contains("unknown transform op"))
    SpecSurface.transformOps.foreach(op => assert(unknown.contains(op),
      s"unknown-op error no longer lists '$op'"))
  }

  test("SPEC_REFERENCE.md op headings match SpecSurface.transformOps exactly, in order") {
    val headings = "(?m)^### ([a-z][a-z0-9_]*)$".r
      .findAllMatchIn(doc).map(_.group(1)).toSeq
    assert(headings == SpecSurface.transformOps,
      s"doc op headings drifted:\n  doc: $headings\n  code: ${SpecSurface.transformOps}")
  }

  test("every config field of every spec case class appears in SPEC_REFERENCE.md") {
    val missing = SpecSurface.fields.toSeq.sortBy(_._1).flatMap {
      case (cls, fieldNames) =>
        fieldNames.filterNot(f => doc.contains(s"`$f`")).map(f => s"$cls.$f")
    }
    assert(missing.isEmpty,
      s"undocumented config fields (add to docs/SPEC_REFERENCE.md): " +
        missing.mkString(", "))
  }

  test("every spec-level audit finding is documented") {
    // the config-level preflight findings (lsh_low_threshold_regime,
    // drift_unbounded_categorical, …) are product surface: a user greps
    // the reference doc for the name Doctor printed — a finding that can
    // fire but isn't documented must fail the build (round-14 directive #8)
    graft.pipeline.Interpreter.specAuditFindings.foreach(f =>
      assert(doc.contains(s"`$f`"),
        s"spec audit finding '$f' missing from SPEC_REFERENCE.md"))
  }

  test("every knn method is documented") {
    SpecSurface.knnMethods.foreach(m => assert(doc.contains(s"`$m`"),
      s"knn method '$m' missing from SPEC_REFERENCE.md"))
  }

  test("SpecFuzzProperties carries a valid-spec generator property per op") {
    val names = SpecFuzzProperties.properties.map(_._1).toSeq
    val uncovered = SpecSurface.transformOps.filterNot(op =>
      names.exists(n => n.startsWith("specfuzz.valid") && n.contains(op)))
    assert(uncovered.isEmpty,
      s"ops with no 'valid …' fuzz generator: ${uncovered.mkString(", ")} " +
        s"(property names: ${names.mkString("; ")})")
  }
}
