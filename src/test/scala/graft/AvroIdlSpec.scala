package graft

import graft.sources.{AvroIdl, AvroSchemaConverter}
import org.apache.avro.{Schema => AvroSchema}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** AvroIdl: the reference's `.avdl` protocol shape (SnowFlakeTable.avdl:1-8)
  * parses to the exact record schema the maven avro plugin would compile,
  * and the full IDL type surface (logical shorthands, composites, nullable
  * `?`, named references, defaults, annotations) maps through
  * AvroSchemaConverter to the right Spark types.
  */
class AvroIdlSpec extends AnyFunSuite {

  val refIdl: String =
    """@namespace("com.amazonaws.services.msf.avro")
      |protocol SnowTableProtocol {
      |        record SnowFlakeTable {
      |                string PRICE;
      |                string CATEGORY;
      |                string NAME;
      |                string UPDATED_AT;
      |        }
      |        }
      |""".stripMargin

  test("the reference's verbatim SnowFlakeTable.avdl parses to its record") {
    val p = AvroIdl.parseProtocol(refIdl)
    assert(p.name == "SnowTableProtocol")
    assert(p.namespace.contains("com.amazonaws.services.msf.avro"))
    val rec = p.soleRecord
    assert(rec.getFullName == "com.amazonaws.services.msf.avro.SnowFlakeTable")
    assert(rec.getFields.size == 4)
    import scala.jdk.CollectionConverters._
    assert(rec.getFields.asScala.map(_.name).toSeq ==
      Seq("PRICE", "CATEGORY", "NAME", "UPDATED_AT"))
    assert(rec.getFields.asScala.forall(_.schema.getType == AvroSchema.Type.STRING))
    val st = AvroIdl.toStructType(refIdl)
    assert(st == StructType(Seq("PRICE", "CATEGORY", "NAME", "UPDATED_AT")
      .map(StructField(_, StringType, nullable = false))))
  }

  test("logical shorthands, composites, nullable ?, decimal(p,s)") {
    val st = AvroIdl.toStructType(
      """protocol P {
        |  // a line comment
        |  record R {
        |    /* a block comment */
        |    long id;
        |    timestamp_ms ts;
        |    date d;
        |    decimal(18,2) amt;
        |    string? maybe;
        |    union { null, double } u;
        |    array<long> xs;
        |    map<string> kv;
        |    boolean flag = true;
        |    int n = 7;
        |  }
        |}""".stripMargin)
    assert(st("id").dataType == LongType && !st("id").nullable)
    assert(st("ts").dataType == TimestampType)
    assert(st("d").dataType == DateType)
    assert(st("amt").dataType == DecimalType(18, 2))
    assert(st("maybe").dataType == StringType && st("maybe").nullable)
    assert(st("u").dataType == DoubleType && st("u").nullable)
    assert(st("xs").dataType == ArrayType(LongType, containsNull = false))
    assert(st("kv").dataType == MapType(StringType, StringType, valueContainsNull = false))
    assert(st("flag").dataType == BooleanType)
    assert(st("n").dataType == IntegerType)
  }

  test("named references between records resolve in declaration order") {
    val p = AvroIdl.parseProtocol(
      """@namespace("x.y")
        |protocol P {
        |  enum Color { RED, GREEN, BLUE }
        |  fixed Hash(16);
        |  record Inner { string a; Color c; }
        |  record Outer { Inner one; array<Inner> many; Hash h; }
        |}""".stripMargin)
    val outer = p.record("Outer")
    assert(outer.getField("one").schema.getFullName == "x.y.Inner")
    assert(outer.getField("many").schema.getElementType.getFullName == "x.y.Inner")
    assert(outer.getField("h").schema.getType == AvroSchema.Type.FIXED)
    val st = AvroIdl.toStructType(
      """@namespace("x.y")
        |protocol P {
        |  enum Color { RED, GREEN, BLUE }
        |  record Inner { string a; Color c; }
        |  record Outer { Inner one; }
        |}""".stripMargin, "Outer")
    assert(st("one").dataType.isInstanceOf[StructType])
    assert(st("one").dataType.asInstanceOf[StructType]("c").dataType == StringType)
  }

  test("forward reference / unknown type / imports fail loudly") {
    intercept[IllegalArgumentException] {
      AvroIdl.parseProtocol("protocol P { record A { B b; } record B { int x; } }")
    }
    intercept[IllegalArgumentException] {
      AvroIdl.parseProtocol("""protocol P { import idl "other.avdl"; record A { int x; } }""")
    }
  }

  test("single-level imports: the reference record split across two files round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("avdl_import")
    try {
      // the shared file carries the reference's SnowFlakeTable shape under
      // its OWN namespace, plus an enum the main record references
      java.nio.file.Files.write(dir.resolve("common.avdl"),
        """@namespace("com.shared")
          |protocol Common {
          |  enum Side { BUY, SELL }
          |  record SnowFlakeTable { string PRICE; string TICKER; }
          |}""".stripMargin.getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("main.avdl"),
        """@namespace("com.pipeline")
          |protocol Pipeline {
          |  import idl "common.avdl";
          |  record Enriched { SnowFlakeTable row; Side side; long seq; }
          |}""".stripMargin.getBytes("UTF-8"))
      val p = AvroIdl.parseProtocolFile(dir.resolve("main.avdl").toString)
      // imported types splice in declaration order, under their own namespace
      assert(p.types.map(_.getFullName) == Seq("com.shared.Side",
        "com.shared.SnowFlakeTable", "com.pipeline.Enriched"))
      val st = AvroSchemaConverter.toStruct(p.record("Enriched"))
      val row = st("row").dataType.asInstanceOf[StructType]
      assert(row.fieldNames.toSeq == Seq("PRICE", "TICKER"))
      assert(st("side").dataType == StringType)
      // `import schema` of plain Avro JSON resolves the same way
      java.nio.file.Files.write(dir.resolve("ext.avsc"),
        """{"type":"record","name":"Ext","namespace":"com.ext",
          |"fields":[{"name":"v","type":"double"}]}""".stripMargin.getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("main2.avdl"),
        """protocol P2 {
          |  import schema "ext.avsc";
          |  record Wrap { Ext e; }
          |}""".stripMargin.getBytes("UTF-8"))
      val p2 = AvroIdl.parseProtocolFile(dir.resolve("main2.avdl").toString)
      assert(p2.record("Wrap").getField("e").schema.getFullName == "com.ext.Ext")
      // nested imports resolve TRANSITIVELY (r11): a two-hop chain through a
      // subdirectory splices the deepest file's types too, each hop resolved
      // relative to ITS OWN file's directory, declaration order preserved
      val sub = java.nio.file.Files.createDirectory(dir.resolve("shared"))
      java.nio.file.Files.write(sub.resolve("base.avdl"),
        """@namespace("com.base")
          |protocol Base { record Leaf { long id; } }""".stripMargin.getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("nested.avdl"),
        """@namespace("com.mid")
          |protocol N {
          |  import idl "shared/base.avdl";
          |  record Mid { Leaf leaf; string tag; }
          |}""".stripMargin.getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("top.avdl"),
        """@namespace("com.top")
          |protocol T {
          |  import idl "nested.avdl";
          |  record Top { Mid mid; Leaf direct; }
          |}""".stripMargin.getBytes("UTF-8"))
      val pt = AvroIdl.parseProtocolFile(dir.resolve("top.avdl").toString)
      assert(pt.types.map(_.getFullName) ==
        Seq("com.base.Leaf", "com.mid.Mid", "com.top.Top"))
      val topSt = AvroSchemaConverter.toStruct(pt.record("Top"))
      assert(topSt("mid").dataType.asInstanceOf[StructType]("leaf").dataType
        .asInstanceOf[StructType].fieldNames.toSeq == Seq("id"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("import cycles fail loudly with the chain; diamonds splice once") {
    val dir = java.nio.file.Files.createTempDirectory("avdl_cycle")
    try {
      // two-file cycle a -> b -> a
      java.nio.file.Files.write(dir.resolve("a.avdl"),
        """protocol A { import idl "b.avdl"; record Ra { int x; } }""".getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("b.avdl"),
        """protocol B { import idl "a.avdl"; record Rb { int y; } }""".getBytes("UTF-8"))
      val e = intercept[IllegalArgumentException] {
        AvroIdl.parseProtocolFile(dir.resolve("a.avdl").toString)
      }
      assert(e.getMessage.contains("import cycle"), e.getMessage)
      assert(e.getMessage.contains("a.avdl") && e.getMessage.contains("b.avdl"))
      // self-import is the degenerate cycle
      java.nio.file.Files.write(dir.resolve("self.avdl"),
        """protocol S { import idl "self.avdl"; }""".getBytes("UTF-8"))
      assert(intercept[IllegalArgumentException] {
        AvroIdl.parseProtocolFile(dir.resolve("self.avdl").toString)
      }.getMessage.contains("import cycle"))
      // a SYMLINK alias of a file already on the chain is still a cycle:
      // membership compares real paths, so the alias can't evade the loud
      // failure and recurse to StackOverflow
      java.nio.file.Files.write(dir.resolve("sym_a.avdl"),
        """protocol SA { import idl "sym_b.avdl"; }""".getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("sym_b.avdl"),
        """protocol SB { import idl "alias_a.avdl"; }""".getBytes("UTF-8"))
      java.nio.file.Files.createSymbolicLink(
        dir.resolve("alias_a.avdl"), dir.resolve("sym_a.avdl"))
      assert(intercept[IllegalArgumentException] {
        AvroIdl.parseProtocolFile(dir.resolve("sym_a.avdl").toString)
      }.getMessage.contains("import cycle"))
      // diamond: d imports b2 and c2, both import base — base splices ONCE
      java.nio.file.Files.write(dir.resolve("base.avdl"),
        """@namespace("com.d")
          |protocol Base { record Leaf { long id; } }""".stripMargin.getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("b2.avdl"),
        """@namespace("com.d")
          |protocol B2 { import idl "base.avdl"; record Rb2 { Leaf l; } }""".stripMargin.getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("c2.avdl"),
        """@namespace("com.d")
          |protocol C2 { import idl "base.avdl"; record Rc2 { Leaf l; } }""".stripMargin.getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("diamond.avdl"),
        """@namespace("com.d")
          |protocol D {
          |  import idl "b2.avdl";
          |  import idl "c2.avdl";
          |  record Top { Rb2 b; Rc2 c; }
          |}""".stripMargin.getBytes("UTF-8"))
      val p = AvroIdl.parseProtocolFile(dir.resolve("diamond.avdl").toString)
      assert(p.types.map(_.getName) == Seq("Leaf", "Rb2", "Rc2", "Top"))
      // but two DIFFERENT types under one short name are a loud ambiguity
      java.nio.file.Files.write(dir.resolve("other_leaf.avdl"),
        """@namespace("com.other")
          |protocol O { record Leaf { string id; } }""".stripMargin.getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("clash.avdl"),
        """protocol K {
          |  import idl "base.avdl";
          |  import idl "other_leaf.avdl";
          |}""".stripMargin.getBytes("UTF-8"))
      assert(intercept[IllegalArgumentException] {
        AvroIdl.parseProtocolFile(dir.resolve("clash.avdl").toString)
      }.getMessage.contains("ambiguous type name 'Leaf'"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("RPC message declarations are skipped, annotations ignored") {
    val p = AvroIdl.parseProtocol(
      """protocol P {
        |  record A { @order("ignore") int x; }
        |  void send(A a);
        |  string ping();
        |}""".stripMargin)
    assert(p.types.map(_.getName) == Seq("A"))
    assert(p.soleRecord.getField("x").schema.getType == AvroSchema.Type.INT)
  }
}
